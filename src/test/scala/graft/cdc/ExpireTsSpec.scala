package graft.cdc

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Instant-addressed snapshot expiry ([[StateStore.expireOlderThan]]):
  * untagged snapshots behind the horizon lose their manifests, tagged
  * ones keep them, the head never expires even when every commit
  * predates the horizon, and timestamp resolution falls back to the
  * nearest SURVIVING snapshot once the version it used to name is
  * expired.
  */
class ExpireTsSpec extends SparkTestBase {

  test("expire by horizon: tag pins, head survives, history refuses") {
    val wh = graft.Scratch.dir("graft-expts-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.expts_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier")
    def wave(df: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
      MergeCommit.mergeBatchMeta(store, target, df
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    wave(sup, 1000L)                                                  // v0
    store.createRef(target, "audit", 0)
    Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
    wave(sup.withColumn("s_acctbal", col("s_acctbal") + 100.0), 2000L) // v1
    Thread.sleep(5); val horizon = System.currentTimeMillis(); Thread.sleep(5)
    wave(sup.withColumn("s_acctbal", col("s_acctbal") + 200.0), 3000L) // v2

    assert(store.versionAtTime(target, horizon) == 1)
    store.expireOlderThan(target, horizon)
    val d = Paths.get(wh).resolve(target)
    assert(!Files.exists(d.resolve("manifest-1.tsv")),
      "untagged v1 behind the horizon must expire")
    assert(Files.exists(d.resolve("manifest-0.tsv")),
      "the audit tag must pin v0's manifest through expiry")
    assert(store.currentVersion(target) == 2)
    assert(store.versionAtTime(target, horizon) == 0,
      "resolution falls back to the nearest surviving (tag-pinned) snapshot")
    assert(store.versionAtTime(target, t1) == 0)

    // Every commit predates a now-horizon: the head still never expires.
    store.expireOlderThan(target, System.currentTimeMillis())
    assert(Files.exists(d.resolve(s"manifest-2.tsv")),
      "the head version never expires")
    assert(store.stateAtRef(spark, target, "audit").count() == sup.count(),
      "the tag still reads wave 1 after both expiries")
  }
}
