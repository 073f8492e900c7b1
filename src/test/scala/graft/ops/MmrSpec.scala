package graft.ops

import graft.SparkTestBase

/** MMR diversity re-rank ([[LlmOps.simMmr]]): pins a hand-computed
  * greedy selection where MMR INVERTS the pure-cosine order (the whole
  * point of the operator — a redundant near-duplicate of the first
  * pick is deferred behind a less-relevant but novel candidate), the
  * λ arithmetic, the deterministic tie rule, and the fixture-level
  * output shape.
  */
class MmrSpec extends SparkTestBase {

  test("greedy selection inverts pure-cosine order on a planted " +
      "near-duplicate; scores carry the λ=0.7 arithmetic") {
    // c1 best; c2 nearly as relevant but a near-duplicate of c1
    // (sim 0.99); c3 less relevant but novel (sim 0.10 to both).
    val rel = Seq((1L, 7, 0.95), (2L, 7, 0.94), (3L, 8, 0.80))
    val sim = Map(
      (1L, 2L) -> 0.99, (2L, 1L) -> 0.99,
      (1L, 3L) -> 0.10, (3L, 1L) -> 0.10,
      (2L, 3L) -> 0.10, (3L, 2L) -> 0.10)
    val picked = LlmOps.mmrGreedy(rel, sim, k = 3)
    assert(picked.map(_._2) == Seq(1L, 3L, 2L),
      "pure-cosine order is (1,2,3); MMR must defer the near-dup: " +
        picked.toString)
    // Hand-computed scores: pick1 = 0.7·0.95; pick2 compares
    // c2: 0.7·0.94 − 0.3·0.99 = 0.361 vs c3: 0.7·0.80 − 0.3·0.10 =
    // 0.53 → c3; pick3 = c2 with max-sim 0.99 against {1,3}.
    assert(picked.map(_._5) == Seq(0.665, 0.53, 0.361))
    assert(picked.map(_._1) == Seq(1, 2, 3), "ranks are 1-based")
  }

  test("deterministic tie rule: equal scores pick the smaller id") {
    val rel = Seq((9L, 0, 0.5), (4L, 0, 0.5), (7L, 0, 0.5))
    val sim = Seq(4L, 7L, 9L).combinations(2).flatMap { case Seq(a, b) =>
      Seq((a, b) -> 0.0, (b, a) -> 0.0)
    }.toMap
    val picked = LlmOps.mmrGreedy(rel, sim, k = 3)
    assert(picked.map(_._2) == Seq(4L, 7L, 9L))
  }

  test("lambda curve: pure relevance tops avg_cos, and lowering " +
      "lambda trades relevance for diversity monotonically") {
    val rows = LlmOps.simMmrCurve(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1.0, 0.7, 0.4))
    // λ=1.0 selects the max-cos set — its avg_cos is the attainable
    // ceiling (a guarantee, not a fixture accident).
    assert(rows.head._2 == rows.map(_._2).max)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq,
      "avg relevance must not increase as lambda drops")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq,
      "redundancy (avg pairwise sim) must not increase as lambda drops")
  }

  test("fixture output: 10 distinct picks, rank 1 is the relevance " +
      "top, every pick comes from the 50-candidate pool") {
    val out = LlmOps.simMmr(spark, sf).collect()
    assert(out.length == 10)
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == 10)
    val byRank = out.sortBy(_.getInt(0))
    // Rank 1 is pure relevance: the max cos in the pool, and its score
    // is exactly the λ·cos definition (no penalty on the first pick).
    // (No "first score dominates all" claim: later penalties can be
    // NEGATIVE if a pick's pairwise cosines to the selected set are —
    // the guarantee is the definition, not global dominance.)
    val maxCos = out.map(_.getDouble(3)).max
    assert(byRank.head.getDouble(3) == maxCos)
    assert(math.abs(byRank.head.getDouble(4) -
      math.floor(0.7 * maxCos * 1e6 + 0.5) / 1e6) < 1e-12)
  }
}
