package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cdc.StateStore

/** Sort-ordered compaction (`maintenance_compact_sort`): the rewrite
  * must be layout-only (data identical between the unsorted and
  * sorted versions — the oracle checks values; here we cross-check
  * the two layouts against each other), and the layout effect must be
  * real: per-file spans of the sort column shrink sharply, and a
  * narrow range query keeps a strict file subset under min/max
  * consult where the arrival-order layout keeps everything.
  */
class CompactSortSpec extends SparkTestBase {

  test("sorted rewrite tightens per-file spans and makes range " +
      "queries prunable; data is layout-invariant") {
    // sf0.01, not the sf0.001 spec default: the per-file cap targets
    // ~4 files/bucket, and at sf0.001 that is ~4 ROWS per file — small
    // enough that an arrival-order file prunes by sampling accident
    // (0.82^4 ≈ 45% of files miss [0,1000] entirely). ~46 rows/file
    // makes the unsorted layout span-everything, which is the point.
    val sfd = "/root/testdata/sf0.01"
    val result = MaintenanceQueries.compactSortLifecycle(spark, sfd)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("bal_sum"))).toMap
    assert(result("unsorted") == result("sorted"),
      "compaction must be layout-only")

    val wh = MaintenanceQueries.sortCompactWh(sfd)
    val target = MaintenanceQueries.SortCompactTarget
    val store = new StateStore(wh, 8)
    val vSorted = store.currentVersion(target)
    val vUnsorted = vSorted - 1

    def spans(v: Int): Seq[(Double, Double)] =
      spark.read.parquet(s"$wh/$target/v$v")
        .groupBy(col("_metadata.file_path"))
        .agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"))
        .collect().map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
        .toSeq

    val su = spans(vUnsorted)
    val ss = spans(vSorted)
    // The max-records cap actually split buckets into multiple files.
    assert(su.size > 8 && ss.size > 8,
      s"expected >1 file per bucket, got ${su.size}/${ss.size}")

    def avgSpan(x: Seq[(Double, Double)]): Double =
      x.map { case (lo, hi) => hi - lo }.sum / x.size
    assert(avgSpan(ss) < avgSpan(su) * 0.5,
      f"sorted avg span ${avgSpan(ss)}%.1f not < half of " +
        f"unsorted ${avgSpan(su)}%.1f")

    // A narrow balance range: min/max consult keeps a strict subset
    // of the sorted files; the arrival-order layout keeps every file
    // (each spans ~the whole range), which is the motivation.
    val (qlo, qhi) = (0.0, 1000.0)
    def kept(x: Seq[(Double, Double)]): Int =
      x.count { case (lo, hi) => hi >= qlo && lo <= qhi }
    // Arrival-order keeps nearly everything (each ~46-row file spans
    // ~the whole domain; only runt remainder files of a few rows can
    // miss the range by sampling accident), the sorted layout keeps
    // well under two-thirds (the range covers ~9% of the domain, ~1-2
    // contiguous files per bucket).
    assert(kept(ss) <= (ss.size * 0.6).toInt,
      s"sorted layout must prune hard: kept ${kept(ss)} of ${ss.size}")
    assert(kept(su) >= (su.size * 0.9).toInt,
      s"fixture drifted: arrival-order layout prunes too much " +
        s"(kept ${kept(su)} of ${su.size}) — the sort demo is moot")
  }
}
