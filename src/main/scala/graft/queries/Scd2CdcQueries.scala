package graft.queries

import graft.Tables
import graft.cdc.{ChangeGen, StateStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** INCREMENTAL SCD Type 2 maintenance — the history table kept current
  * through the micro-batched change stream, the streaming twin of
  * [[MaintenanceQueries.scd2]].
  *
  * The hard part of incremental SCD2 is the LATE EVENT: an event whose
  * ts precedes intervals already written must splice into the middle
  * of a key's chain, truncating its predecessor and shortening (or
  * re-opening) its successor — a row-appending SCD2 writer corrupts
  * here. This implementation never splices in place; per micro-batch
  * it:
  *
  *  1. upserts the batch's events into `hist.events`, an append-only
  *     event store bucket-partitioned by key (dedup on the full event —
  *     checkpoint-replayed batches are idempotent);
  *  2. RE-DERIVES the interval chains of the AFFECTED KEYS ONLY from
  *     their full event sets, and commits those keys' buckets of
  *     `hist.scd2` — the same "recompute a key's view from its events"
  *     move as [[graft.cdc.Merge.mergeOrdered]], extended from
  *     latest-image to full history.
  *
  * Batch cost is (evented keys' history sizes), never table size: both
  * tables are bucket-pruned by key, the interval window sorts only
  * affected keys' events, and untouched buckets are carried by
  * manifest re-pointing (StateStore.scala:24-31). Slicing independence
  * is by construction — the derived chain depends only on the event
  * SET, not on arrival grouping — which the spec asserts by draining
  * the same interleaved log 1 file and 4 files at a time.
  */
object Scd2CdcQueries {

  private val NBuckets = 8
  private val EventsTable = "hist.events"
  private val Scd2Table = "hist.scd2"

  /** Interval derivation for one set of keys' complete event rows: THE
    * batch SCD2 core ([[MaintenanceQueries.intervalize]] — the
    * property-tested derivation) applied to a bucket-pruned slice, so
    * the incremental path can never drift from the batch semantics.
    */
  private def deriveIntervals(events: DataFrame): DataFrame =
    MaintenanceQueries.intervalize(events, "c_custkey")

  private def processBatch(store: StateStore, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val batchEvents = batch.select(
        col("row.c_custkey").as("c_custkey"),
        col("row.c_acctbal").as("c_acctbal"),
        col("_cdc.op").as("op"),
        col("_cdc.ts_ms").as("ts"),
        col("_cdc.seq").as("seq"))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("c_custkey"), NBuckets))
      .persist()
    try {
      val affected = batchEvents.select(StateStore.BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val oldEvents =
        if (store.exists(EventsTable))
          store.readBuckets(spark, EventsTable, affected)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL("c_custkey bigint, c_acctbal double, " +
            "op string, ts bigint, seq bigint, _bucket int"))
      // Event-set union, exact-duplicate dedup: a checkpoint-replayed
      // micro-batch re-delivers identical event rows, so distinct()
      // makes replay a no-op (exactly-once on top of at-least-once).
      val allEvents = oldEvents.unionByName(batchEvents).distinct().persist()
      store.commit(spark, EventsTable, allEvents, affected)
      // Affected keys' chains re-derived from their FULL event sets —
      // a late event lands in its slot because the chain is a pure
      // function of the set, not of arrival order. Rows of un-evented
      // keys in the affected buckets are re-derived too (their events
      // were just re-read); their intervals come out identical.
      // Commit only buckets the derivation populated: a bucket whose
      // keys so far have ONLY delete events derives no intervals, and
      // manifesting an empty bucket would point at a dir partitionBy
      // never wrote. Such a bucket appears once a non-delete event for
      // it arrives; derived-nonempty can never go back to empty
      // because event sets only grow.
      val derived = deriveIntervals(allEvents).persist()
      val derivedAffected = derived.select(StateStore.BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (derivedAffected.nonEmpty)
        store.commit(spark, Scd2Table, derived, derivedAffected)
      derived.unpersist(blocking = false)
      allEvents.unpersist(blocking = false)
    } finally batchEvents.unpersist(blocking = false)
  }

  private[queries] def runMaintenance(spark: SparkSession, sfDir: String,
      filesPerTrigger: Int): StateStore =
    DrainHarness.drain(spark,
      ChangeGen.changeLog(Tables.load(spark, sfDir, "customer"),
        "c_custkey", "c_acctbal", "commerce", "customer"),
      s"$sfDir/scd2", NBuckets, filesPerTrigger)(processBatch)

  /** Stage this family's change log without draining it — Bench's
    * untimed warmup, so staging I/O never lands in a timed repeat.
    */
  def prestage(spark: SparkSession, sfDir: String): Unit =
    DrainHarness.stage(
      ChangeGen.changeLog(Tables.load(spark, sfDir, "customer"),
        "c_custkey", "c_acctbal", "commerce", "customer"),
      s"$sfDir/scd2")

  private[queries] def readHistory(spark: SparkSession,
      store: StateStore): DataFrame =
    store.rawState(spark, Scd2Table)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("c_custkey", "valid_from")

  /** The registered query: drain the interleaved log (2 files per
    * trigger → cross-batch out-of-order arrival), read the maintained
    * history back. Oracle = the batch SCD2 oracle — incremental
    * maintenance must be invisible in the result.
    */
  def scd2Incremental(spark: SparkSession, sfDir: String,
                      filesPerTrigger: Int = 2): DataFrame =
    readHistory(spark, runMaintenance(spark, sfDir, filesPerTrigger))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_scd2_incremental" -> ((s, d) => scd2Incremental(s, d)))

  def oracles: Map[String, String] = Map(
    "cdc_scd2_incremental" -> MaintenanceQueries.scd2Oracle)
}
