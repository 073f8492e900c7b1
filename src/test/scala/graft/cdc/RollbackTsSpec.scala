package graft.cdc

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** RESTORE TO TIMESTAMP ([[StateStore.restoreAtTime]]): the marker
  * resolves to the version committed before it, the restore is a NEW
  * pointer-only commit (version bumps by one, no data directory), and
  * a post-restore `versionAtTime(now)` resolves past the rolled-back
  * wave to the restore line (monotone even though the restore's
  * manifest is byte-identical to the old one).
  */
class RollbackTsSpec extends SparkTestBase {

  test("restoreAtTime: pointer-only commit to the marker's version") {
    val wh = graft.Scratch.dir("graft-rbts-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.rbts_spec"
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
    wave(sup, 1000L)                                   // v0
    Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
    wave(sup.withColumn("s_acctbal", col("s_acctbal") + 100.0), 2000L) // v1

    assert(store.versionAtTime(target, t1) == 0)
    val vR = store.restoreAtTime(target, t1)           // v2 = copy of v0
    assert(vR == 2 && store.currentVersion(target) == 2)
    assert(!Files.exists(Paths.get(wh).resolve(target).resolve(s"v$vR")),
      "restore must not write a data directory")

    val base = sup.agg(sum(round(col("s_acctbal"), 2))).head.getDouble(0)
    val got = store.currentState(spark, target)
      .agg(sum(round(col("s_acctbal"), 2))).head.getDouble(0)
    assert(math.abs(got - base) < 1e-6,
      "restored state must equal the pre-mistake wave")
    assert(store.versionAtTime(target, System.currentTimeMillis()) == vR,
      "a now-marker resolves to the restore commit, not the rolled-past wave")
  }
}
