package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Signed-hyperplane LSH ANN invariants (llm_sim_lsh / _recall). */
class SimLshSpec extends SparkTestBase {

  test("lsh results come from one bucket and rank below the exact top") {
    val rows = LlmOps.simLsh(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.map(_.getInt(1)).distinct.length == 1,
      "a single-probe search must stay inside the probe's bucket")
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 7),
      "3 planes give signatures in 0..7")
    val cos = rows.map(_.getDouble(2))
    assert(cos.sameElements(cos.sorted.reverse), "results must rank by cosine")
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("lsh candidates are a strict subset of the corpus; no self-match") {
    val ids = LlmOps.simLsh(spark, sf).collect().map(_.getLong(0))
    assert(!ids.contains(0L), "the probe must not match itself")
    assert(ids.distinct.length == ids.length)
  }

  test("recall audit is consistent: hits = |exact ∩ approx|, recall = hits/k") {
    val r = LlmOps.simLshRecall(spark, sf).head()
    val (k, hits, recall) = (r.getInt(0), r.getLong(1), r.getDouble(2))
    assert(k == 5)
    assert(hits >= 0 && hits <= k)
    assert(math.abs(recall - hits.toDouble / k) < 0.005 + 1e-9)
  }
}
