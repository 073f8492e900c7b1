package graft.ops

import graft.SparkTestBase

/** Constructed-case invariants for the round-7 text/dedup additions:
  * substring-window dedup, unigram-LM scoring, BPE pair counting. The
  * oracle gate proves fixture agreement; these pin the SEMANTICS on
  * inputs where the right answer is computable by hand.
  */
class TextOpsSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = graft.Scratch.dir("textops").toString
    rows.map { case (id, text) =>
      (id, text, "en", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedupSubstring: exact copy fully flagged, partial overlap " +
      "counted window-exactly, fresh docs clean") {
    val base = (1 to 20).map(i => s"t$i").mkString(" ")
    val partial = ((1 to 10).map(i => s"t$i") ++
      (1 to 10).map(i => s"u$i")).mkString(" ")
    val fresh = (1 to 8).map(i => s"v$i").mkString(" ")
    val dir = docsDir(Seq(1L -> base, 2L -> base, 3L -> partial, 4L -> fresh))
    val out = LlmOps.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(4)))).toMap
    // doc 1: 13 windows (20-8+1), first owner of all of them.
    assert(out(1L) === ((13L, 0L, false)))
    // doc 2 = exact copy: every window owned by doc 1 → dropped.
    assert(out(2L) === ((13L, 13L, true)))
    // doc 3 shares tokens 1..10 with doc 1: windows starting at
    // offsets 1..3 lie fully inside the shared prefix → 3 of 13.
    assert(out(3L) === ((13L, 3L, false)))
    // doc 4: one window, nobody earlier has it.
    assert(out(4L) === ((1L, 0L, false)))
  }

  test("textLm: NLL equals the hand-computed unigram model") {
    val dir = docsDir(Seq(1L -> "x x x", 2L -> "z"))
    val out = LlmOps.textLm(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Corpus: x×3, z×1 → p(x)=0.75, p(z)=0.25.
    val nll1 = BigDecimal(-math.log(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nll2 = BigDecimal(-math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === ((3L, nll1)))
    assert(out(2L) === ((1L, nll2)))
  }

  test("textBpe: adjacent-pair counts with deterministic tie order") {
    val dir = docsDir(Seq(1L -> "a b a b a", 2L -> "c c"))
    val out = LlmOps.textBpe(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b a b a" → (a b)×2, (b a)×2; "c c" → (c c)×1.
    // Ties (cnt 2) break on pair text ascending.
    assert(out === Seq(("a b", 2L), ("b a", 2L), ("c c", 1L)))
  }

  test("dedupNormalized: case/punctuation/whitespace variants hash " +
      "together; distinct content stays apart") {
    val dir = docsDir(Seq(
      1L -> "Hello, World! How are you?",
      2L -> "hello world   how are you",
      3L -> "HELLO   world, how ARE you!!",
      4L -> "a genuinely different document"))
    val out = LlmOps.dedupNormalized(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Docs 1-3 canonicalize to "hello world how are you" → one
    // group, keeper = lowest id; doc 4 stands alone.
    assert(out === Map(1L -> 3L, 4L -> 1L))
  }

  test("textBigram: conditional NLL is order-sensitive and hand-exact") {
    // Corpus pair counts: ab=4, ba=2, aa=2, bb=2; contexts a·=6, b·=4.
    val dir = docsDir(Seq(
      1L -> "a b a b a b",   // 3×P(b|a)=4/6, 2×P(a|b)=2/4
      2L -> "a a a b b b"))  // 2×P(a|a)=2/6, 1×P(b|a)=4/6, 2×P(b|b)=2/4
    val out = LlmOps.textBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nll1 = -(3 * math.log(4.0 / 6) + 2 * math.log(2.0 / 4)) / 5
    val nll2 = -(2 * math.log(2.0 / 6) + math.log(4.0 / 6) +
      2 * math.log(2.0 / 4)) / 5
    assert(out(1L)._1 == 5 && out(2L)._1 == 5)
    assert(math.abs(out(1L)._2 - nll1) < 1e-6, s"doc1 ${out(1L)._2} != $nll1")
    assert(math.abs(out(2L)._2 - nll2) < 1e-6, s"doc2 ${out(2L)._2} != $nll2")
    // Same unigram bag, different order → different bigram scores.
    assert(out(1L)._2 < out(2L)._2)
  }

  test("filterBlocklist: whole-token hits only; threshold keeps <= 2") {
    val dir = docsDir(Seq(
      1L -> "slow slowly slow big bigger",  // slow=2, big=1 → 3 hits, drop
      2L -> "slowness and bigness abound",  // substrings never count
      3L -> "slow big"))                    // 2 hits, keep
    val out = LlmOps.filterBlocklist(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getBoolean(5))).toMap
    assert(out(1L) == ((2, 1, false)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((0, 0, true)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((1, 1, true)), s"doc3: ${out(3L)}")
  }

  test("textChunk: stride-complete coverage, bounded width, stable ids") {
    val rows = LlmOps.textChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (chunkId, docId, k, len) =>
      assert(chunkId == docId * 100 + k, "chunk ids must be doc-major")
      assert(len >= 1 && len <= 120, s"chunk length $len outside (0, 120]")
    }
    val byDoc = rows.groupBy(_._2)
    val nChars = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (docId, chunks) =>
      val ks = chunks.map(_._3).sorted
      assert(ks.toSeq == (0 until chunks.length), s"doc $docId gaps in k")
      // strides cover the text: last chunk starts before the end,
      // next-would-be chunk would start at or past it
      val n = nChars(docId)
      assert((ks.last * 90) < n && ((ks.last + 1) * 90) >= n,
        s"doc $docId: ${ks.length} chunks do not tile $n chars at stride 90")
    }
  }
}
