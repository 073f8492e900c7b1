package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** End-to-end watermark late-drop over the ordered replay log
  * (StreamingOps.lateDrop). The MemoryStream late-drop spec in
  * StreamingOpsSpec pins the operator semantics; this one pins the
  * oracle-checked SparkEntry query: the late set is non-empty (the
  * test can't pass vacuously) and the emitted aggregates cover exactly
  * the on-time rows — every real window finalized, every late row
  * dropped, no sentinel leakage.
  */
class LateDropSpec extends SparkTestBase {
  test("late replay rows are dropped; all on-time windows finalize") {
    val ev = Tables.load(spark, sf, "events")
    val isLate = col("ts") < lit("2024-01-02").cast("timestamp") &&
      col("event_id") % 10 === 0
    val nLate = ev.filter(isLate).count()
    assert(nLate > 0, "fixture must contain late-replay rows")

    val out = StreamingOps.lateDrop(spark, sf)
    assert(out.columns.toSeq ===
      Seq("w_start_us", "w_end_us", "event_type", "n", "total"))
    val emitted = out.agg(sum("n")).head().getLong(0)
    assert(emitted === ev.count() - nLate)
    // No sentinel windows leak through the output filter.
    assert(out.filter(col("event_type") === "sentinel").isEmpty)
  }
}
