package graft.queries

import graft.SparkTestBase

/** PSI drift monitor (`profile_drift`) and the streaming DSIR twin
  * (`stream_importance`): the drift report must localize the
  * engineered tail shift, and the stream's drained totals must equal
  * the batch resample's rollup exactly (per-doc determinism makes the
  * result micro-batch-slicing-independent).
  */
class DriftSpec extends SparkTestBase {

  test("profile_drift localizes the engineered tail inflation") {
    // sf0.01, not the sf0.001 spec default: ~200 orders per year give
    // bin counts whose sampling noise rivals the engineered signal —
    // the localization claim needs the ~2,200-per-year population.
    val rows = CatalogQueries.profileDrift(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Int]("bin"), r.getAs[Double]("psi_term")))
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)),
      "report must be bin-ordered")
    val total = rows.map(_._2).sum
    // The +50%-on-every-third-order drift lands at moderate-shift PSI…
    assert(total > 0.03 && total < 0.5, s"unexpected total PSI $total")
    // …and the report pinpoints it: the top bin (where the inflated
    // prices migrate) carries the dominant term.
    val top = rows.maxBy(_._2)
    assert(top._1 == rows.map(_._1).max,
      s"drift must concentrate in the top bin, got bin ${top._1}")
    assert(top._2 > total / 2,
      "top bin must carry the majority of the PSI")
  }

  test("stream_importance drained totals equal the batch resample " +
      "rollup (slicing independence)") {
    val streamed = graft.ops.StreamingOps.streamImportance(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val batch = graft.ops.LlmOps.mixImportance(spark, sf)
      .select("source", "n_total", "n_kept", "id_sum_kept")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == batch)
  }
}
