package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clone-aware vacuum: expiring SOURCE history must never strand a
  * live shallow clone (the hazard Delta/Iceberg document and punt on).
  * Protect → detach → reclaim, end to end:
  *   1. vacuum on the source KEEPS the version dirs the clone's
  *      manifests still reach into, and the clone reads its full
  *      birth state afterwards;
  *   2. after the clone detaches (compaction + vacuuming its own
  *      pre-compaction history), the next source vacuum reclaims
  *      those dirs and drops the dead back-reference;
  *   3. a deleted clone's reference stops pinning immediately.
  */
class CloneVacuumSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  private def withMeta(df: DataFrame, ts: Long): DataFrame =
    df.withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, lit(0L))
      .withColumn(StateStore.DeletedCol, lit(false))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("k"), NBuckets))

  private def commitWave(store: StateStore, target: String,
                         ts: Long): Int = {
    // 40 keys cover all 4 buckets, so every commit rewrites the whole
    // table and old version dirs become src-unreferenced immediately.
    val wave = withMeta(
      (0L until 40L).map(k => (k, ts * 1000 + k)).toDF("k", "v"), ts)
    store.commit(spark, target, wave, 0 until NBuckets)
  }

  private def versionDirs(store: StateStore, target: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(store.warehouse, target)
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("v\\d+")).toSet
    finally s.close()
  }

  test("vacuum keeps clone-referenced dirs; detach releases them") {
    val store = new StateStore(
      graft.Scratch.dir("graft-clvac-").toString, NBuckets)
    val (src, dst) = ("clv.src", "clv.clone")
    commitWave(store, src, 1)
    commitWave(store, src, 2)
    val vAtClone = store.currentVersion(src)
    store.cloneTable(src, dst)
    val birthState = store.currentState(spark, dst)
      .select("k", "v").as[(Long, Long)].collect().toMap

    // Source moves on twice, then expires everything but current.
    commitWave(store, src, 3)
    commitWave(store, src, 4)
    store.vacuum(src, keepVersions = 1)

    // The clone-referenced dir survived; pre-clone v0 was reclaimed.
    assert(versionDirs(store, src).contains(s"v$vAtClone"),
      "vacuum must keep dirs a live clone references")
    assert(!versionDirs(store, src).contains("v0"),
      "unreferenced pre-clone history must still be reclaimed")
    val afterVacuum = store.currentState(spark, dst)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(afterVacuum === birthState,
      "clone must read its full birth state after source vacuum")

    // Detach: compact the clone, vacuum its pre-compaction history,
    // then the source reclaims and drops the dead reference.
    store.compactTable(spark, dst)
    store.vacuum(dst, keepVersions = 1)
    store.vacuum(src, keepVersions = 1)
    assert(!versionDirs(store, src).contains(s"v$vAtClone"),
      "detached clone must not pin source history")
    assert(!Files.exists(
      Paths.get(store.warehouse, src, StateStore.RefsFile)),
      "dead reference must be pruned")
    val detached = store.currentState(spark, dst)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(detached === birthState)
  }

  test("a deleted clone stops pinning immediately") {
    val store = new StateStore(
      graft.Scratch.dir("graft-clvac2-").toString, NBuckets)
    val (src, dst) = ("clv.src2", "clv.gone")
    commitWave(store, src, 1)
    val vAtClone = store.currentVersion(src)
    store.cloneTable(src, dst)
    commitWave(store, src, 2)
    // The clone is dropped wholesale (table delete = rm -r).
    val cd = Paths.get(store.warehouse, dst)
    Files.walk(cd).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    store.vacuum(src, keepVersions = 1)
    assert(!versionDirs(store, src).contains(s"v$vAtClone"),
      "a deleted clone's reference must not pin history")
  }
}
