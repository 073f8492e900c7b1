package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Debezium INCREMENTAL SNAPSHOT — the DBLog watermark algorithm the
  * reference's connector class ships for re-snapshotting live tables
  * (SqlServerConnector supports `incremental.snapshot.chunk.size`; the
  * signal-table protocol). A table is snapshotted in key-ordered CHUNKS
  * concurrently with the ongoing change stream:
  *
  *   1. per chunk: write a LOW watermark into the log, SELECT the
  *      chunk's rows, write a HIGH watermark;
  *   2. dedup rule: a chunk row for key k is DISCARDED when a change
  *      event for k landed inside the chunk's watermark window — the
  *      stream already emitted something newer; surviving rows are
  *      emitted as READ events positioned at the high watermark;
  *   3. the consumer merges read + change events by log position;
  *      latest position wins per key.
  *
  * [[CdcQueries.snapshotChunked]] already proves the COMPLEMENTARY
  * property — that the merged final state is chunk-invariant (the
  * ordered merge makes the dedup rule value-neutral). What that query
  * cannot show is whether the dedup DECISION fired where the protocol
  * says it must, because every route yields the same value. So this
  * query returns, per key, the merged final value plus WHICH EVENT
  * KIND delivered it (`src` = 'r' snapshot read / 'u' streamed update)
  * and the covering chunk; the oracle recomputes the decision from the
  * closed form of the watermark arithmetic. A dedup-rule regression
  * (wrong window bound, read positioned at the low instead of high
  * watermark) flips `src` on exactly the boundary keys and goes red
  * here while staying green in `cdc_snapshot_chunked`.
  *
  * Scale: chunking is what makes a 100 TB snapshot restartable — each
  * chunk is an independent bounded SELECT, and state to resume is one
  * key per table. Here every per-chunk step is one scan-local
  * projection (chunk id, watermarks and positions are key arithmetic);
  * the dedup is a filter, not a join, because the in-window test only
  * needs the event's own (key, position, window) — and the final merge
  * is the same `max_by` hash aggregation as the A12 merge, map-side
  * partial-aggregated.
  */
object SnapshotQueries {

  private val ChunkKeys = 300L  // keys per chunk
  private val WmStride  = 1000L // log positions between chunk opens
  private val WmWindow  = 500L  // positions between low and high wm
  private val LsnSpace  = 5000L // update positions spread over this

  /** Update wave: keys k%5=0 change at pseudo-random log position
    * (k*37)%5000 — spread across every chunk window so all three
    * cases (fold-before-low, drop-in-window, supersede-after-high)
    * occur.
    */
  def incrementalSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
    val chunk = expr(s"k div $ChunkKeys")
    val lowWm = chunk * WmStride
    val highWm = lowWm + WmWindow
    val lsnU: Column = (col("k") * 37) % LsnSpace

    // Streamed change events: every update, at its log position.
    val updates = base.filter(col("k") % 5 === 0)
      .select(col("k"), (col("bal") + 50.0).as("v"), lsnU.as("pos"),
        lit("u").as("src"))

    // Chunk SELECT: the read image folds any update committed BEFORE
    // the chunk's low watermark (the select sees current state); the
    // DBLog dedup then discards reads whose key changed inside
    // [low, high] — the stream covers those.
    val reads = base
      .select(col("k"),
        when(col("k") % 5 === 0 && lsnU < lowWm, col("bal") + 50.0)
          .otherwise(col("bal")).as("v"),
        highWm.as("pos"), lit("r").as("src"),
        (col("k") % 5 === 0 && lsnU >= lowWm && lsnU <= highWm)
          .as("dropped"))
      .filter(!col("dropped")).drop("dropped")

    updates.unionAll(reads)
      .groupBy("k")
      .agg(max_by(struct(col("v"), col("src")), col("pos")).as("w"))
      .select(col("k").as("c_custkey"), round(col("w.v"), 2).as("bal"),
        col("w.src").as("src"),
        expr(s"k div $ChunkKeys").cast("long").as("chunk_id"))
      .orderBy("c_custkey")
  }

  val incrementalSnapshotOracle: String =
    """SELECT c_custkey,
      |  ROUND(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0
      |             ELSE c_acctbal END, 2) AS bal,
      |  CASE WHEN c_custkey % 5 = 0
      |        AND (c_custkey * 37) % 5000 >= (c_custkey // 300) * 1000
      |       THEN 'u' ELSE 'r' END AS src,
      |  c_custkey // 300 AS chunk_id
      |FROM customer ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_incremental_snapshot" -> incrementalSnapshot)

  def oracles: Map[String, String] = Map(
    "cdc_incremental_snapshot" -> incrementalSnapshotOracle)
}
