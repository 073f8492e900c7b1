package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The WAP gate inside the streaming commit path — what the
  * oracle-checked final state of `cdc_pipeline_wap` can't show:
  *   1. the quarantine holds EXACTLY the poison micro-batch's
  *      envelope slice (every pk%5 key, once, at ts=3500);
  *   2. the published version chain has no gap — the dropped staged
  *      version's slot was reused by the next clean batch, and
  *      `$snapshots` lists one row per PUBLISHED commit;
  *   3. the poisoned keys surface with their CLEAN wave values (the
  *      +200 update survived, the -99999 poison never published).
  */
class WapPipelineSpec extends SparkTestBase {

  test("gated pipeline quarantines the poison wave and keeps the " +
      "version chain gapless") {
    val state = PipelineQueries.pipelineWap(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val (wh, quarantine) = PipelineQueries.wapPipeDirs(sf)
    val store = new graft.cdc.StateStore(wh, nBuckets = 8)
    val target = "cdc.commerce_customer"

    // 1. Quarantine = exactly the poison slice.
    val q = spark.read.parquet(quarantine)
    val expectedPoison = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 5 === 0).count()
    assert(q.count() === expectedPoison,
      "quarantine must hold every poison-wave event exactly once")
    val tsVals = q.select(col("_cdc.ts_ms")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(tsVals === Set(3500L),
      "nothing but the poison wave may be quarantined")

    // 2. Gapless published chain: 4 micro-batches, 1 dropped → 3
    // commits → head version 2, one $snapshots row per published
    // commit, no dangling staged files.
    assert(store.currentVersion(target) === 2)
    assert(store.snapshots(spark, target).count() === 3)

    // 3. Poisoned keys carry their clean-wave values.
    val base = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"),
        round(col("c_acctbal") + 200.0, 2).as("want"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base.nonEmpty && base.forall { case (k, want) =>
      state.get(k).contains(want)
    }, "pk%5 keys must show the +200 update, never the poison value")
  }
}
