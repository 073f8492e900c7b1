package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE ordered-merge commit recipe (A11+A12+A13): compact a
  * flattened micro-batch slice, attach merge metadata + bucket, read
  * only the affected state buckets, mutually align schemas, run the
  * latest-(ts,seq)-wins merge, commit just those buckets atomically.
  * Every maintainer — the streaming pipeline's per-target merge, the
  * lifecycle query's batch phases, and the incremental aggregate /
  * join-view maintainers — runs THIS code path, so merge-metadata or
  * affected-bucket changes happen in exactly one place.
  */
object MergeCommit {

  /** The committed merge's working frames: the pre-merge and post-merge
    * affected-bucket slices (for callers that derive deltas from the
    * state transition, e.g. the incremental-aggregate contribution
    * pass), the compacted latest-per-key batch itself (`batchMeta`,
    * one row per key — the WAP gate's audit scope, so the gate never
    * has to re-distinct the raw slice) and the committed version. All
    * frames stay readable after later commits — version dirs are
    * immutable until vacuum.
    */
  final case class Result(preSlice: DataFrame, postSlice: DataFrame,
                          version: Int, batchMeta: DataFrame) {
    def unpersist(): Unit = {
      preSlice.unpersist(blocking = false)
      postSlice.unpersist(blocking = false)
      batchMeta.unpersist(blocking = false)
    }
  }

  /** Merge-metadata projection of a [[Merge.compactKeepTombstones]]
    * batch: row columns + (ts, seq, deleted) + the pk hash bucket.
    */
  def toBatchMeta(compacted: DataFrame, pkCols: Seq[String],
                  nBuckets: Int): DataFrame =
    compacted.select(
      (col("row.*") +:
        Seq(col("_cdc.ts_ms").as(StateStore.TsCol),
          col("_cdc.seq").as(StateStore.SeqCol),
          (col("_cdc.op") === Envelope.OpDelete)
            .as(StateStore.DeletedCol))): _*)
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(pkCols, nBuckets))

  /** Merge a metadata-carrying batch (the [[toBatchMeta]] shape — any
    * column subset that keeps the pk + metadata columns) into `table`.
    * None when the batch is empty. With `persistSlices` the returned
    * pre/post slices are persisted — the caller unpersists via
    * [[Result.unpersist]]. `persistBatch` additionally persists the
    * compacted batch itself — ONLY for callers that read
    * [[Result.batchMeta]] back (the WAP gate's audit scope); the
    * incremental maintainers that just consume pre/post slices must
    * not pay a per-micro-batch caching pass for a frame they ignore.
    */
  def mergeBatchMeta(store: StateStore, table: String, batchMeta: DataFrame,
                     pkCols: Seq[String],
                     persistSlices: Boolean = false,
                     stage: Boolean = false,
                     persistBatch: Boolean = false): Option[Result] = {
    val spark = batchMeta.sparkSession
    val batchMetaP = if (persistBatch) batchMeta.persist() else batchMeta
    val affected = batchMetaP.select(StateStore.BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) {
      if (persistBatch) batchMetaP.unpersist(blocking = false)
      return None
    }
    val state =
      if (store.exists(table)) store.readBuckets(spark, table, affected)
      else store.emptyState(spark, table) // A10 auto-create on commit
    // A11 — mutual alignment: widen conflicts, backfill missing columns.
    val stateAligned0 = SchemaEvolution.align(state, batchMetaP)
    val stateAligned =
      if (persistSlices) stateAligned0.persist() else stateAligned0
    val merged0 = Merge.mergeOrdered(stateAligned,
      SchemaEvolution.align(batchMetaP, stateAligned), pkCols)
    val merged = if (persistSlices) merged0.persist() else merged0
    val v =
      if (stage) store.stageCommit(spark, table, merged, affected)
      else store.commit(spark, table, merged, affected)
    Some(Result(stateAligned, merged, v, batchMetaP))
  }

  /** Compact + merge a flattened slice ([[Envelope.flatten]] output).
    * With `stage = true` the merge lands as an UNPUBLISHED branch
    * version ([[StateStore.stageCommit]]) for a write-audit-publish
    * gate — same merge path, head pointer untouched.
    */
  def mergeFlattened(store: StateStore, table: String, slice: DataFrame,
                     pkCols: Seq[String],
                     persistSlices: Boolean = false,
                     stage: Boolean = false,
                     persistBatch: Boolean = false): Option[Result] =
    mergeBatchMeta(store, table,
      toBatchMeta(Merge.compactKeepTombstones(slice, pkCols), pkCols,
        store.nBuckets),
      pkCols, persistSlices, stage, persistBatch)
}
