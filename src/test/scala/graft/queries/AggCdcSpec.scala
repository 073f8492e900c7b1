package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance contracts: the delta-maintained
  * summary must be BIT-IDENTICAL (long cents — no epsilon anywhere)
  * across micro-batch slicings and to a from-scratch rebuild, and the
  * group totals must account for every surviving key exactly once even
  * through the group-move wave.
  */
class AggCdcSpec extends SparkTestBase {

  private def summarize(filesPerTrigger: Int): Map[Int, (Long, Double)] =
    AggCdcQueries.aggIncremental(spark, sf, filesPerTrigger).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("summary state is bit-identical across micro-batch slicings") {
    val oneAtATime = summarize(1)
    val allAtOnce = summarize(4)
    assert(oneAtATime.nonEmpty)
    assert(oneAtATime === allAtOnce,
      "telescoping long-cents deltas must not depend on log slicing")
  }

  test("delta-maintained summary equals a from-scratch rebuild, and " +
      "group totals cover every surviving key once") {
    val store = AggCdcQueries.runMaintenance(spark, sf, 2)
    val deltas = AggCdcQueries.readSummary(spark, store).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val v = AggCdcQueries.rebuildSummary(spark, store)
    assert(v > 0, "rebuild must commit a fresh version")
    val rebuilt = AggCdcQueries.readSummary(spark, store).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rebuilt === deltas,
      "delta-maintained and rebuilt summaries must agree exactly")

    // Every surviving key (pk%7!=0) contributes to exactly one group —
    // the move wave re-grouped, never duplicated or dropped.
    val survivors = Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 7 =!= 0).count()
    assert(deltas.values.map(_._1).sum === survivors,
      "summary membership must equal the surviving key count")
    // Moved groups exist (nation+25 ids) — the re-grouping case fired.
    assert(deltas.keySet.exists(_ >= 25),
      "group-move wave should populate shifted nation ids")
  }
}
