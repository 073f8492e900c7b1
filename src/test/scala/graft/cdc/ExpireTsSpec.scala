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

  test("retain_last keeps the newest N; combined with older_than the " +
      "stricter retention wins (Iceberg's composition rule)") {
    val wh = graft.Scratch.dir("graft-retain-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.retain_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier").limit(30)
    def wave(delta: Double, ts: Long): Unit = {
      MergeCommit.mergeBatchMeta(store, target, sup
        .withColumn("s_acctbal", col("s_acctbal") + delta)
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    (0 to 4).foreach(i => wave(i * 10.0, 1000L + i))    // v0..v4
    val d = Paths.get(wh).resolve(target)
    val horizon = System.currentTimeMillis() // every commit is older

    // retain_last=3 with a horizon proposing EVERYTHING: the count
    // constraint keeps more, so v2..v4 survive and v0..v1 expire.
    store.expireSnapshots(target, olderThan = Some(horizon),
      retainLast = Some(3))
    assert((0 to 1).forall(v => !Files.exists(d.resolve(s"manifest-$v.tsv"))),
      "v0,v1 are past both constraints and must expire")
    assert((2 to 4).forall(v => Files.exists(d.resolve(s"manifest-$v.tsv"))),
      "retain_last=3 must keep v2..v4 even though the horizon proposes them")

    // Now the other direction: retain_last=1 proposes v2,v3 too, but a
    // horizon at v3's instant keeps v3 (and the head) — time is the
    // stricter retention here.
    val t3 = store.commitTimeOf(target, 3)
    store.expireSnapshots(target, olderThan = Some(t3),
      retainLast = Some(1))
    assert(!Files.exists(d.resolve("manifest-2.tsv")),
      "v2 is behind the horizon AND outside retain_last — expires")
    assert(Files.exists(d.resolve("manifest-3.tsv")),
      "v3's instant >= older_than: the time constraint keeps it " +
        "even though retain_last=1 proposed it")
    assert(Files.exists(d.resolve("manifest-4.tsv")), "head never expires")

    // retain_last alone (no horizon): everything but the newest N goes.
    store.expireSnapshots(target, retainLast = Some(1))
    assert(!Files.exists(d.resolve("manifest-3.tsv")) &&
      Files.exists(d.resolve("manifest-4.tsv")),
      "retain_last without older_than expires all but the newest N")
  }

  test("retain_last contract edges: n > versions keeps everything, " +
      "n < 1 is rejected (ADVICE r15 clamp)") {
    val wh = graft.Scratch.dir("graft-retain-edge-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.retain_edge_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier").limit(10)
    def wave(delta: Double, ts: Long): Unit = {
      MergeCommit.mergeBatchMeta(store, target, sup
        .withColumn("s_acctbal", col("s_acctbal") + delta)
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    (0 to 2).foreach(i => wave(i * 10.0, 1000L + i))    // v0..v2
    val d = Paths.get(wh).resolve(target)

    // n far above the version count: firstKeptByCount clamps to 0, so
    // the expiry keeps every snapshot instead of handing vacuum a
    // negative first-kept / oversized keepVersions.
    store.expireSnapshots(target, retainLast = Some(100))
    assert((0 to 2).forall(v => Files.exists(d.resolve(s"manifest-$v.tsv"))),
      "retain_last > versions must keep every snapshot")
    assert(store.currentVersion(target) == 2)

    // n < 1 "retains nothing" — contradicts head-never-expires; the
    // contract rejects it rather than silently keeping only the head.
    intercept[IllegalArgumentException] {
      store.expireSnapshots(target, retainLast = Some(0))
    }
    intercept[IllegalArgumentException] {
      store.expireSnapshots(target, retainLast = Some(-3))
    }
  }
}
