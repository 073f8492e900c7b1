package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** File-level bloom skipping index (`layout_bloom`): the sidecar must
  * actually SKIP files, must never skip a file that holds the key
  * (no false negatives — that would silently drop rows), and the
  * pruned answer must equal the full scan bit for bit. Also pins the
  * motivation: the same layout's min/max o_custkey ranges prune
  * NOTHING, so range-based zone maps cannot cover this lookup.
  */
class BloomIndexSpec extends SparkTestBase {

  test("bloom sidecar skips files, keeps every file holding the key, " +
      "answer equals full scan; min/max ranges would prune nothing") {
    // Build the layout + sidecar through the query itself.
    val result = MaintenanceQueries.layoutBloom(spark, sf).collect()
    assert(result.length == 1)
    val laid = MaintenanceQueries.bloomLaidDir(sf)
    val probe = result(0).getAs[Long]("probe_key")

    val sidecar = MaintenanceQueries.bloomSidecar(spark, laid)
    val kept = MaintenanceQueries.bloomKeptFiles(sidecar, probe)

    // Files were actually skipped (the probe is a ≤2-order customer —
    // its rows live in at most 2 of the 8 orderkey-ranged files, and
    // at this filter size false positives are essentially absent).
    assert(sidecar.size == 8, s"expected 8 laid files, got ${sidecar.size}")
    assert(kept.size < sidecar.size,
      s"no files skipped: kept ${kept.size} of ${sidecar.size}")

    // No false negatives: every file that truly holds the probe key
    // is in the kept set.
    val holding = spark.read.parquet(laid)
      .filter(col("o_custkey") === probe)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(holding.nonEmpty && holding.subsetOf(kept.toSet),
      s"false negative: $holding not within kept $kept")

    // Pruned answer == full scan (residual predicate keeps it exact).
    val full = spark.read.parquet(laid)
      .filter(col("o_custkey") === probe)
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).head()
    assert(result(0).getAs[Long]("n_orders") == full.getLong(0))
    assert(result(0).getAs[Double]("total_price") == full.getDouble(1))

    // The motivation: min/max ranges on the unclustered column keep
    // every file — membership pruning is the only lever here.
    val ranges = spark.read.parquet(laid)
      .groupBy(col("_metadata.file_path"))
      .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"))
      .collect()
    val rangeKept = ranges.filter(r =>
      r.getAs[Long]("lo") <= probe && probe <= r.getAs[Long]("hi"))
    assert(rangeKept.length == ranges.length,
      "fixture drifted: min/max pruning works here, bloom demo is moot")
  }
}
