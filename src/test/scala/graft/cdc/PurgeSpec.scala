package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten purge (StateStore.purgeKeys): erased keys
  * must vanish from EVERY retained snapshot — head state, every
  * time-travelable version, and the data files themselves — while
  * untouched rows and the commit lineage survive bit-for-bit; a live
  * clone blocks the purge (shared dirs would silently erase the
  * clone's rows too).
  */
class PurgeSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  private def withMeta(df: DataFrame, ts: Long): DataFrame =
    df.withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, lit(0L))
      .withColumn(StateStore.DeletedCol, lit(false))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("k"), NBuckets))

  private def commitWave(store: StateStore, target: String,
                         ts: Long): Int =
    store.commit(spark, target,
      withMeta((0L until 40L).map(k => (k, ts * 1000 + k)).toDF("k", "v"),
        ts),
      0 until NBuckets)

  test("purged keys vanish from head, history, and the files") {
    val store = new StateStore(
      graft.Scratch.dir("graft-purge-").toString, NBuckets)
    val target = "p.t"
    commitWave(store, target, 1)
    commitWave(store, target, 2)
    commitWave(store, target, 3)
    val purged = Seq(3L, 17L, 20L)
    val erased = store.purgeKeys(spark, target, "k", purged)
    assert(erased === purged.size)

    // Head and every retained version: purged keys gone, rest intact.
    (0 to store.currentVersion(target)).foreach { v =>
      val at = store.stateAt(spark, target, v)
        .select("k").as[Long].collect().toSet
      assert(purged.forall(!at.contains(_)),
        s"version $v still serves purged keys")
      assert(at.size === 40 - purged.size,
        s"version $v lost non-purged rows")
    }
    // Version pointer unmoved — purge is not a commit.
    assert(store.currentVersion(target) === 2)

    // The bytes are gone: no retained data file contains the keys.
    val d = Paths.get(store.warehouse, target)
    val remaining = {
      val s = Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(_.getParent.getParent.toString).toSet
      } finally s.close()
    }
    remaining.foreach { base =>
      val ks = spark.read.parquet(
        Files.list(Paths.get(base)).toArray.map(_.toString)
          .filter(_.contains("_bucket=")): _*)
        .select("k").as[Long].collect().toSet
      assert(purged.forall(!ks.contains(_)), s"$base still holds bytes")
    }
  }

  test("DataFrame overload on the forced JOIN path equals the Seq " +
      "path result exactly") {
    // Two identical stores, one purged via the driver-list path, one
    // via the distributed anti-/semi-join path (threshold 0 forces it
    // at fixture scale); every retained version must agree key-set
    // for key-set, and both must report the same erased-row count.
    val target = "p.t"
    val purged = Seq(3L, 17L, 20L)
    def build(): StateStore = {
      val st = new StateStore(
        graft.Scratch.dir("graft-purge-df-").toString, NBuckets)
      commitWave(st, target, 1)
      commitWave(st, target, 2)
      st
    }
    val seqStore = build()
    val dfStore = build()
    val erasedSeq = seqStore.purgeKeys(spark, target, "k", purged)
    val erasedDf = dfStore.purgeKeys(spark, target, "k",
      purged.toDF("k"), driverListThreshold = 0L)
    assert(erasedSeq === erasedDf)
    (0 to seqStore.currentVersion(target)).foreach { v =>
      val a = seqStore.stateAt(spark, target, v)
        .select("k", "v").as[(Long, Long)].collect().toSet
      val b = dfStore.stateAt(spark, target, v)
        .select("k", "v").as[(Long, Long)].collect().toSet
      assert(a === b, s"version $v diverged between purge paths")
    }
  }

  test("purging an undetached shallow clone is refused; source intact") {
    // ADVICE r8 (high): a clone's manifest entries are relative paths
    // into the SOURCE ("../<src>/vK/_bucket=B"); before the guard,
    // purging the clone resolved those paths, escaped the clone's
    // directory, and deleted source version dirs the source's own
    // manifests still referenced — silent data loss. The purge must
    // refuse until the clone compacts under its own directory.
    val store = new StateStore(
      graft.Scratch.dir("graft-purge3-").toString, NBuckets)
    val (src, dst) = ("p3.src", "p3.clone")
    commitWave(store, src, 1)
    store.cloneTable(src, dst)
    val ex = intercept[IllegalArgumentException] {
      store.purgeKeys(spark, dst, "k", Seq(1L))
    }
    assert(ex.getMessage.contains("shallow clone"))
    // Nothing escaped: the source still serves all 40 rows, and no
    // stray "purge-.." directory appeared anywhere in the warehouse.
    assert(store.currentState(spark, src).count() === 40)
    val stray = {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(Paths.get(store.warehouse))
      try s.iterator().asScala.exists(
        _.getFileName.toString.startsWith("purge-."))
      finally s.close()
    }
    assert(!stray, "mangled purge-.. dir written")
    // A compacted-but-not-vacuumed clone still RETAINS manifest-0,
    // whose entries share the source's files — erasing "every retained
    // snapshot" would still destroy source data, so purge keeps
    // refusing until the pre-compaction history is vacuumed (the full
    // detach runbook from cloneTable's scaladoc).
    store.compactTable(spark, dst)
    intercept[IllegalArgumentException] {
      store.purgeKeys(spark, dst, "k", Seq(1L))
    }
    store.vacuum(dst, keepVersions = 1)
    val erased = store.purgeKeys(spark, dst, "k", Seq(1L))
    assert(erased === 1)
    assert(store.currentState(spark, dst).count() === 39)
    assert(store.currentState(spark, src).count() === 40)
  }

  test("erasedHead counts live rows only, not retained tombstones") {
    // ADVICE r8 (low): the audit count previously included tombstoned
    // rows of the erased keys, so it could exceed the rows actually
    // visible at head.
    val store = new StateStore(
      graft.Scratch.dir("graft-purge4-").toString, NBuckets)
    val target = "p4.t"
    commitWave(store, target, 1)
    // Wave 2 tombstones key 5: at head, key 5 is a retained tombstone
    // and key 3 is live.
    val wave2 = (0L until 40L).map(k => (k, 2000L + k)).toDF("k", "v")
      .withColumn(StateStore.TsCol, lit(2L))
      .withColumn(StateStore.SeqCol, lit(0L))
      .withColumn(StateStore.DeletedCol, col("k") === 5L)
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("k"), NBuckets))
    store.commit(spark, target, wave2, 0 until NBuckets)
    val erased = store.purgeKeys(spark, target, "k", Seq(3L, 5L))
    assert(erased === 1, "tombstone of key 5 must not count as erased")
    (0 to store.currentVersion(target)).foreach { v =>
      val at = store.stateAt(spark, target, v)
        .select("k").as[Long].collect().toSet
      assert(!at.contains(3L) && !at.contains(5L),
        s"version $v still serves purged keys")
    }
  }

  test("purge between optimistic commits never resurrects erased keys") {
    // VERDICT r8 #6 (purge × OCC): purge re-points manifests OUTSIDE
    // the commitOptimistic claim protocol, so it is an OFFLINE op —
    // quiesce writers first (now documented on purgeKeys). This spec
    // pins the safe serialized interleaving: commit → purge → commit,
    // where the later optimistic commit's merge reads POST-purge state,
    // so the erased key cannot ride a merge back into a new version.
    val store = new StateStore(
      graft.Scratch.dir("graft-purge5-").toString, NBuckets)
    val target = "p5.t"
    store.commitOptimistic(spark, target) { _ =>
      (withMeta((0L until 20L).map(k => (k, k)).toDF("k", "v"), 1),
        0 until NBuckets)
    }
    store.commitOptimistic(spark, target) { _ =>
      val cur = store.rawState(spark, target)
        .withColumn("v", col("v") + 100L)
        .withColumn(StateStore.TsCol, lit(2L))
        .localCheckpoint(true)
      (cur, 0 until NBuckets)
    }
    assert(store.purgeKeys(spark, target, "k", Seq(7L)) === 1)
    // Writer resumes after the purge: its merge reads current (purged)
    // state, so key 7 stays gone in the new version and all history.
    store.commitOptimistic(spark, target) { _ =>
      val cur = store.rawState(spark, target)
        .withColumn("v", col("v") + 1000L)
        .withColumn(StateStore.TsCol, lit(3L))
        .localCheckpoint(true)
      (cur, 0 until NBuckets)
    }
    (0 to store.currentVersion(target)).foreach { v =>
      val at = store.stateAt(spark, target, v)
        .select("k").as[Long].collect().toSet
      assert(!at.contains(7L), s"version $v resurrected the purged key")
    }
    assert(store.currentState(spark, target).count() === 19)
  }

  test("a live clone blocks purge; vacuum reclaims orphaned purge dirs") {
    val store = new StateStore(
      graft.Scratch.dir("graft-purge2-").toString, NBuckets)
    val (src, dst) = ("p.src", "p.clone")
    commitWave(store, src, 1)
    store.cloneTable(src, dst)
    val ex = intercept[IllegalArgumentException] {
      store.purgeKeys(spark, src, "k", Seq(1L))
    }
    assert(ex.getMessage.contains("clone"))

    // Detach the clone, purge, then expire history: the purge dirs
    // of expired versions get reclaimed.
    store.compactTable(spark, dst)
    store.vacuum(dst, keepVersions = 1)
    commitWave(store, src, 2)
    store.purgeKeys(spark, src, "k", Seq(1L))
    store.vacuum(src, keepVersions = 1)
    val d = Paths.get(store.warehouse, src)
    val purgeDirs = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("purge-")).toSet
      finally s.close()
    }
    val headDirs = store.manifest(src).values.map(_.split("/")(0)).toSet
    assert(purgeDirs.forall(headDirs.contains),
      s"unreferenced purge dirs must be vacuumed: $purgeDirs vs $headDirs")
    val at = store.currentState(spark, src)
      .select("k").as[Long].collect().toSet
    assert(!at.contains(1L) && at.size === 39)
  }
}
