package graft.queries

import graft.SparkTestBase

/** Metadata-table + expectations invariants at sf0.001 (the oracle
  * gate runs at sf0.01; these pin the scale-independent shape).
  */
class SnapshotsMetaSpec extends SparkTestBase {

  test("snapshots history: 4 versions, single-key commit rewrites " +
      "one bucket, replayed pre-delete update leaves live count fixed") {
    val rows = MaintenanceQueries.maintenanceSnapshots(spark, sf).collect()
    assert(rows.length === 4, "one metadata row per committed version")
    val byV = rows.map(r => r.getInt(0) ->
      (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(byV(0)._3 && !byV(1)._3 && !byV(2)._3 && !byV(3)._3,
      "schema journal marks only the creating commit")
    assert(byV(3)._2 === 1, "single-key commit must rewrite exactly 1 bucket")
    assert(byV(3)._4 === byV(2)._4,
      "replaying key 0's ts=2000 update after its ts=4000 delete must " +
        "not resurrect it (ordered merge keeps the newer tombstone)")
    assert(byV(2)._4 < byV(1)._4, "the delete wave shrinks live rows")
    assert(byV(0)._4 === byV(1)._4, "the update wave preserves live rows")
  }

  test("snapshots stays readable after vacuum: expired versions are " +
      "omitted, not thrown on (Iceberg \\$snapshots semantics)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.cdc.StateStore
    import spark.implicits._
    val store = new StateStore(
      graft.Scratch.dir("graft-snapvac-").toString, 4)
    val target = "meta.snapvac"
    def wave(ts: Long) = store.commit(spark, target,
      (0L until 40L).map(k => (k, ts * 1000 + k)).toDF("k", "v")
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, lit(0L))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol,
          StateStore.bucketExpr(Seq("k"), 4)),
      0 until 4)
    (1L to 3L).foreach(wave)
    store.vacuum(target, keepVersions = 1)
    val rows = store.snapshots(spark, target).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2),
      "only the retained version surfaces after vacuum")
    assert(rows.head.isNullAt(3),
      "schema_changed must be NULL (unknown) when the prior version's " +
        "schema file was reclaimed by vacuum — never a spurious TRUE")
  }

  test("expectations report: exactly the date-range rule fails in batch " +
      "and the value-cap rule fails in streaming") {
    val batch = CatalogQueries.profileExpectations(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(batch.size === 6)
    val batchFailing = batch.filter(!_._2._2).keySet
    assert(batchFailing === Set("o_orderdate_in_range"),
      s"fixture must fail exactly the date rule, got $batchFailing")
    assert(batch("o_orderdate_in_range")._1 > 0)
    val stream = graft.ops.StreamingOps.streamExpectations(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(stream.size === 4)
    val streamFailing = stream.filter(!_._2._2).keySet
    assert(streamFailing === Set("event_value_below_cap"),
      s"fixture must fail exactly the value cap, got $streamFailing")
  }
}
