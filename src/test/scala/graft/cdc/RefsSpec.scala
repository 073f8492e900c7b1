package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named refs (Iceberg tag/branch semantics) on the versioned store —
  * the contracts the `maintenance_refs` report can't show:
  *   1. tags are immutable (moveRef refuses), branches move;
  *   2. a tag pins its version — AND the older data dirs its manifest
  *      reaches — through vacuum; drop-then-vacuum reclaims;
  *   3. refs to uncommitted versions are refused, duplicate names
  *      are refused, and stateAtRef on an unknown name throws.
  */
class RefsSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  private def wave(ts: Long, keys: Range = 0 until 40): DataFrame =
    keys.map(n => (n.toLong, ts * 1000 + n)).toDF("k", "v")
      .withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, lit(0L))
      .withColumn(StateStore.DeletedCol, lit(false))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("k"), NBuckets))

  private def affectedOf(df: DataFrame): Seq[Int] =
    df.select(StateStore.BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  private def versionDirs(store: StateStore, target: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(store.warehouse, target)
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("v\\d+")).toSet
    finally s.close()
  }

  test("tags are immutable, branches move, bad refs are refused") {
    val store = new StateStore(
      graft.Scratch.dir("graft-refs-spec-").toString, NBuckets)
    val t = "refs.t"
    store.commit(spark, t, wave(1), 0 until NBuckets)
    store.commit(spark, t, wave(2), 0 until NBuckets)
    store.createRef(t, "audit", 0, "tag")
    store.createRef(t, "rel", 0, "branch")
    intercept[IllegalArgumentException] {
      store.moveRef(t, "audit", 1) // tags never move
    }
    store.moveRef(t, "rel", 1)
    assert(store.namedRefs(t).toSet ===
      Set(("audit", "tag", 0), ("rel", "branch", 1)))
    intercept[IllegalArgumentException] {
      store.createRef(t, "audit", 1) // duplicate name
    }
    intercept[IllegalArgumentException] {
      store.createRef(t, "future", 7) // not a committed version
    }
    // Names that would corrupt the line-oriented refs file (quote,
    // comma, brace, newline, empty) are refused at the write entry
    // point — one bad ref must never break resolution for ALL refs.
    Seq("a\"b", "a,b", "a}b", "a\nb", "", "a b").foreach { bad =>
      intercept[IllegalArgumentException] { store.createRef(t, bad, 0) }
    }
    store.createRef(t, "ok-1.2_x/y", 0) // full allowed charset round-trips
    assert(store.namedRefs(t).exists(_._1 == "ok-1.2_x/y"))
    store.dropRef(t, "ok-1.2_x/y")
    intercept[IllegalArgumentException] {
      store.stateAtRef(spark, t, "nope")
    }
    assert(store.stateAtRef(spark, t, "audit")
      .agg(max("v")).head.getLong(0) === 1039L)
    assert(store.stateAtRef(spark, t, "head")
      .agg(max("v")).head.getLong(0) === 2039L)
    // Rollback by name: a pointer-only commit whose state equals the
    // tag's; the rolled-past version stays time-travelable.
    val rolled = store.restoreRef(t, "audit")
    assert(rolled === 2 && store.currentVersion(t) === 2)
    assert(store.currentState(spark, t)
      .agg(max("v")).head.getLong(0) === 1039L,
      "head must read the tagged state after restoreRef")
    assert(store.stateAt(spark, t, 1)
      .agg(max("v")).head.getLong(0) === 2039L,
      "the rolled-past version stays time-travelable")
  }

  test("a tag pins its version and its REACHED older dirs through " +
      "vacuum; dropping the tag releases them") {
    val store = new StateStore(
      graft.Scratch.dir("graft-refs-spec2-").toString, NBuckets)
    val t = "refs.t2"
    // v0 writes all buckets; v1 rewrites ONE bucket (key 0's hash
    // bucket, full bucket contents with key 0 updated), so the tag at
    // v1 reaches v0's dirs for the other buckets — vacuum must keep
    // those too, not just v1/.
    store.commit(spark, t, wave(1), 0 until NBuckets)
    val b0 = affectedOf(wave(1).filter(col("k") === 0L)).head
    val v1wave = wave(1).filter(col(StateStore.BucketCol) === b0)
      .withColumn("v",
        when(col("k") === 0L, lit(2000L)).otherwise(col("v")))
      .withColumn(StateStore.TsCol, lit(2L))
    store.commit(spark, t, v1wave, Seq(b0))
    store.commit(spark, t, wave(3), 0 until NBuckets)
    store.createRef(t, "pin", 1, "tag")
    store.vacuum(t, keepVersions = 1)
    assert(versionDirs(store, t) === Set("v0", "v1", "v2"),
      "the tag's manifest reaches v0's unrewritten buckets - all kept")
    val pinned = store.stateAtRef(spark, t, "pin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pinned.size === 40 && pinned(0L) === 2000L &&
      pinned.forall { case (k, v) =>
        v === (if (k == 0L) 2000L else 1000L + k) },
      "the tagged state reads exactly v1 after vacuum")
    store.dropRef(t, "pin")
    store.vacuum(t, keepVersions = 1)
    assert(versionDirs(store, t) === Set("v2"),
      "dropping the tag releases the pinned history to the next vacuum")
  }

  test("diffRefs prunes to manifest-changed buckets and classifies " +
      "insert/update/delete by value") {
    val store = new StateStore(
      graft.Scratch.dir("graft-refs-spec3-").toString, NBuckets)
    val t = "refs.t3"
    store.commit(spark, t, wave(1), 0 until NBuckets)
    store.createRef(t, "base", 0, "tag")
    // One commit rewrites ONLY key 0's bucket: key 0 updated, its
    // bucket-mate key (first other key in the bucket) deleted, one
    // new key (40, same bucket by construction below) inserted.
    val b0 = affectedOf(wave(1).filter(col("k") === 0L)).head
    val bucketKeys = wave(1).filter(col(StateStore.BucketCol) === b0)
      .select("k").collect().map(_.getLong(0)).sorted
    val victim = bucketKeys.find(_ != 0L).get
    val newKey = (40L to 200L).find(k =>
      affectedOf(wave(1, 0 until 1)
        .withColumn("k", lit(k))
        .withColumn(StateStore.BucketCol,
          StateStore.bucketExpr(Seq("k"), NBuckets))).head == b0).get
    val v1wave = wave(1).filter(col(StateStore.BucketCol) === b0)
      .withColumn("v", when(col("k") === 0L, lit(9999L)).otherwise(col("v")))
      .withColumn(StateStore.DeletedCol, col("k") === victim)
      .unionByName(wave(1, 0 until 1)
        .withColumn("k", lit(newKey)).withColumn("v", lit(7777L))
        .withColumn(StateStore.BucketCol,
          StateStore.bucketExpr(Seq("k"), NBuckets)))
      .withColumn(StateStore.TsCol, lit(2L))
    store.commit(spark, t, v1wave, Seq(b0))
    assert(store.changedBucketsBetween(t, 0, 1) === Seq(b0),
      "only the rewritten bucket may be read by the diff")
    assert(store.changedBucketsBetween(t, 1, 1) === Seq.empty,
      "self-diff reads nothing")
    assert(store.diffRefs(spark, t, "head", "head", Seq("k")).count() === 0)
    val diff = store.diffRefs(spark, t, "base", "head", Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(diff === Map(
      0L -> ((9999L, "update")),
      victim -> ((1000L + victim, "delete")),
      newKey -> ((7777L, "insert"))),
      s"unchanged bucket-mates must be value-dropped, got $diff")
  }

  test("diffRefs across a schema boundary compares ALIGNED images") {
    // The after-side commit adds a new column `w`; the before side is
    // null-backfilled by mutual alignment, so every rewritten-bucket
    // row classifies as update (it gained a value), never as a crash
    // or a spurious insert/delete.
    val store = new StateStore(
      graft.Scratch.dir("graft-refs-spec4-").toString, NBuckets)
    val t = "refs.t4"
    store.commit(spark, t, wave(1), 0 until NBuckets)
    store.createRef(t, "base", 0, "tag")
    val b0 = affectedOf(wave(1).filter(col("k") === 0L)).head
    val v1wave = wave(1).filter(col(StateStore.BucketCol) === b0)
      .withColumn("v",
        when(col("k") === 0L, lit(9999L)).otherwise(col("v")))
      .withColumn("w", lit("x"))
      .withColumn(StateStore.TsCol, lit(2L))
    store.commit(spark, t, v1wave, Seq(b0))
    val diff = store.diffRefs(spark, t, "base", "head", Seq("k"))
      .collect()
    val bucketKeys = wave(1).filter(col(StateStore.BucketCol) === b0)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(diff.map(r => r.getAs[String]("change_type")).toSet
      === Set("update"),
      "a gained column value is an update, nothing else")
    assert(diff.map(_.getLong(0)).toSet === bucketKeys,
      "exactly the rewritten bucket's keys changed")
    val k0 = diff.find(_.getLong(0) == 0L).get
    assert(k0.getAs[Long]("v") === 9999L && k0.getAs[String]("w") === "x")
  }

  test("PROPERTY: diffRefs equals the brute-force state diff for " +
      "random second waves") {
    // The bucket-pruned, manifest-driven diff must agree with the
    // naive full comparison of the two collected states for ANY
    // update/delete/insert mix — including waves that rewrite a
    // bucket without changing some of its rows (value-drop), delete
    // whole buckets' keys, or insert keys into fresh buckets.
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val gen = for {
      upd <- Gen.someOf(0L until 30L)
      del <- Gen.someOf(0L until 30L)
      ins <- Gen.someOf(30L until 40L)
    } yield (upd.toSet -- del.toSet, del.toSet, ins.toSet)
    var caseNo = 0
    val prop = Prop.forAll(gen) { case (upd, del, ins) =>
      caseNo += 1
      val store = new StateStore(
        graft.Scratch.dir(s"graft-refs-prop-").toString, NBuckets)
      val t = s"refs.prop$caseNo"
      store.commit(spark, t, wave(1, 0 until 30), 0 until NBuckets)
      store.createRef(t, "base", 0, "tag")
      val touched = upd ++ del ++ ins
      if (touched.nonEmpty) {
        val touchedBuckets = affectedOf(
          wave(1, 0 until 40).filter(col("k").isin(touched.toSeq: _*)))
        // Full contents of every touched bucket, with the wave applied.
        val v1 = wave(1, 0 until 30)
          .filter(col(StateStore.BucketCol).isin(touchedBuckets: _*))
          .withColumn("v", when(col("k").isin(upd.toSeq: _*),
            col("v") + 100000L).otherwise(col("v")))
          .withColumn(StateStore.DeletedCol, col("k").isin(del.toSeq: _*))
          .unionByName(wave(2, 0 until 40)
            .filter(col("k").isin(ins.toSeq: _*)))
          .withColumn(StateStore.TsCol, lit(2L))
        store.commit(spark, t, v1, touchedBuckets)
      }
      val got = store.diffRefs(spark, t, "base", "head", Seq("k"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      val before = store.stateAt(spark, t, 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val after = store.currentState(spark, t)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want =
        (after.keySet -- before.keySet).map(k =>
          k -> (after(k), "insert")) ++
        (before.keySet -- after.keySet).map(k =>
          k -> (before(k), "delete")) ++
        (before.keySet & after.keySet).collect {
          case k if before(k) != after(k) => k -> (after(k), "update")
        }
      got == want.toMap
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
