package graft.ops

import graft.SparkTestBase

/** Reciprocal rank fusion ([[LlmOps.rankFuseRrf]]): the fused list
  * draws only from the two legs, the score is exactly the k=60 RRF
  * arithmetic over the published ranks, and consensus beats a single
  * leg's top when the other leg ignores it (the re-ranking the
  * operator exists to produce).
  */
class RankFuseSpec extends SparkTestBase {

  test("fused scores are the k=60 identity over the leg ranks; " +
      "membership comes from the legs only") {
    val out = LlmOps.rankFuseRrf(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val rb = Option(r.get(1)).map(_.asInstanceOf[Int])
      val rt = Option(r.get(2)).map(_.asInstanceOf[Int])
      assert(rb.nonEmpty || rt.nonEmpty,
        "a fused doc must appear in at least one leg")
      val expected = rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rt.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val r6 = math.floor(expected * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == r6,
        s"rrf(${r.get(0)}) must equal the published-rank identity")
    }
    // Consensus ordering: any doc ranked by BOTH legs outscores a doc
    // only one leg ranked at its best (1/61 + 1/70 > 1/61 + 0).
    val both = out.filter(r => r.get(1) != null && r.get(2) != null)
    val single = out.filter(r => r.get(1) == null || r.get(2) == null)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getDouble(3)).min > single.map(_.getDouble(3)).max ||
        single.forall(r => (if (r.get(1) != null) r.getInt(1)
                            else r.getInt(2)) <= 10),
        "a two-leg doc loses only to a single-leg doc with a " +
          "dominatingly better rank")
  }

  test("hybrid lexical+vector: the score identity holds and any " +
      "consensus doc outranks every one-leg-only doc") {
    val out = LlmOps.rankHybrid(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val rl = Option(r.get(1)).map(_.asInstanceOf[Int])
      val rv = Option(r.get(2)).map(_.asInstanceOf[Int])
      val expected = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(3) ==
        math.floor(expected * 1e6 + 0.5) / 1e6)
    }
    // RRF arithmetic guarantee with both legs cut at 20:
    // worst consensus = 1/80 + 1/80 = 0.025 > best single = 1/61.
    val both = out.filter(r => r.get(1) != null && r.get(2) != null)
    val single = out.filter(r => r.get(1) == null || r.get(2) == null)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getDouble(3)).min > single.map(_.getDouble(3)).max,
        "with k=60 and 20-deep legs, saying AND meaning the query " +
          "always beats either alone")
  }
}
