package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Branch-based write-audit-publish on the versioned store: the
  * contracts the `maintenance_wap_branch` report can't show.
  *   1. A staged version is INVISIBLE at head until published — and
  *      readable via time travel for the audit.
  *   2. Publishing is a pure pointer swap: no data rewrite, history
  *      intact.
  *   3. Dropping a failed branch reclaims its files, `$snapshots`
  *      never lists it, and the next stage reuses the version slot.
  *   4. A committed version can never be dropped.
  */
class WapBranchSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  private def withMeta(df: DataFrame, ts: Long): DataFrame =
    df.withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, lit(0L))
      .withColumn(StateStore.DeletedCol, lit(false))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("k"), NBuckets))

  private def wave(ts: Long): DataFrame =
    withMeta((0L until 40L).map(n => (n, ts * 1000 + n)).toDF("k", "v"), ts)

  private def versionDirs(store: StateStore, target: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(store.warehouse, target)
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("v\\d+")).toSet
    finally s.close()
  }

  test("staged branch is head-invisible, audit-readable, publishable") {
    val store = new StateStore(
      graft.Scratch.dir("graft-wapbr-spec-").toString, NBuckets)
    val t = "wap.t"
    store.commit(spark, t, wave(1), 0 until NBuckets)
    val staged = store.stageCommit(spark, t, wave(2), 0 until NBuckets)
    assert(staged === 1)
    assert(store.currentVersion(t) === 0,
      "staging must not move the head pointer")
    assert(store.currentState(spark, t).agg(max("v")).head.getLong(0)
      === 1039L, "head readers must still see the committed wave")
    assert(store.stateAt(spark, t, staged).agg(max("v")).head.getLong(0)
      === 2039L, "the audit must see the staged wave via time travel")
    store.publishStaged(t, staged)
    assert(store.currentVersion(t) === 1)
    assert(store.currentState(spark, t).agg(max("v")).head.getLong(0)
      === 2039L, "publish is a pointer swap onto the staged data")
    assert(store.stateAt(spark, t, 0).count() === 40L,
      "history below the branch point stays readable")
  }

  test("dropped branch reclaims files, hides from $snapshots, frees " +
      "the slot; committed versions refuse to drop") {
    val store = new StateStore(
      graft.Scratch.dir("graft-wapbr-spec2-").toString, NBuckets)
    val t = "wap.t2"
    store.commit(spark, t, wave(1), 0 until NBuckets)
    val staged = store.stageCommit(spark, t, wave(2), 0 until NBuckets)
    assert(versionDirs(store, t).contains("v1"))
    store.dropStaged(t, staged)
    assert(store.currentVersion(t) === 0)
    assert(!versionDirs(store, t).contains("v1"),
      "drop must reclaim the branch's data dir")
    assert(!Files.exists(
      Paths.get(store.warehouse, t, s"manifest-$staged.tsv")),
      "drop must reclaim the branch's manifest")
    assert(store.snapshots(spark, t).collect().map(_.getInt(0)).toSeq
      === Seq(0), "$snapshots must never list a dropped branch")
    // The slot is free: the next stage (or commit) takes version 1
    // again, exactly as if the failed branch had never existed.
    val restaged = store.stageCommit(spark, t, wave(3), 0 until NBuckets)
    assert(restaged === 1)
    store.publishStaged(t, restaged)
    assert(store.currentState(spark, t).agg(max("v")).head.getLong(0)
      === 3039L)
    intercept[IllegalArgumentException] {
      store.dropStaged(t, 1) // now committed — must refuse
    }
    intercept[IllegalArgumentException] {
      store.publishStaged(t, 5) // nothing staged there
    }
  }
}
