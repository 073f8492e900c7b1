package graft.queries

import graft.SparkTestBase
import graft.cdc.StateStore
import org.apache.spark.sql.functions._

/** Rebucketing contracts: the evolved layout must hold the identical
  * state, and bucket-pruned reads must keep working against the new
  * bucket count.
  */
class RebucketSpec extends SparkTestBase {

  test("rebucket migrates state row-identically and the evolved " +
      "layout stays bucket-prunable") {
    val out = MaintenanceQueries.rebucket(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val (b8, n8, bal8) = out("pre_evolve")
    val (b16, n16, bal16) = out("evolved")
    assert(b8 === 8L && b16 === 16L)
    assert(n8 === n16 && bal8 === bal16,
      "the re-hash rewrite must not change the table")
    val (_, nf, _) = out("post_wave")
    assert(nf < n16, "the post-evolution delete wave must apply")

    // Bucket pruning on the evolved layout: a key is found by reading
    // ONLY the single 16-way bucket it hashes to.
    val store = MaintenanceQueries.evolvedStore(sf)
    val target = "cdc.commerce_customer_rb"
    val probe = store.currentState(spark, target)
      .select("c_custkey").orderBy("c_custkey").head.getLong(0)
    val bucket = store.currentState(spark, target)
      .filter(col("c_custkey") === probe)
      .select(StateStore.bucketExpr(Seq("c_custkey"), 16).as("b"))
      .head.getInt(0)
    val pruned = store.readBuckets(spark, target, Seq(bucket))
      .filter(col("c_custkey") === probe)
    assert(pruned.count() === 1L,
      "the evolved manifest must serve single-bucket pruned reads")
  }
}
