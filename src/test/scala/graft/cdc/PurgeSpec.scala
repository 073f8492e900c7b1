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
      Files.createTempDirectory("graft-purge-").toString, NBuckets)
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

  test("a live clone blocks purge; vacuum reclaims orphaned purge dirs") {
    val store = new StateStore(
      Files.createTempDirectory("graft-purge2-").toString, NBuckets)
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
