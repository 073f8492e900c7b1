package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-v2 SEQUENCE-NUMBER delete resolution — the part of the
  * reference's sink table format [[MaintenanceQueries.mergeMor]] does
  * not model. That query demonstrates the write-amplification contract
  * (append-only equality-delete sidecars masked by newest-delete
  * version, plus compaction); THIS one demonstrates the format-v2
  * resolution RULES a reader must apply, including the second delete
  * kind the spec defines. The Iceberg sink the reference deploys
  * (kafka/config/connect-iceberg-sink.json — `upsert` mode on
  * id-columns) writes per commit: an equality-delete on the key PLUS
  * the new data row, at the SAME sequence number, and the reader
  * resolves by sequence:
  *
  *   - an EQUALITY delete applies to data rows whose data sequence is
  *     STRICTLY LESS than the delete's sequence (so the data row
  *     written by the same upsert commit — same sequence — survives its
  *     own delete);
  *   - a POSITION delete names (data_file, row_pos) and applies to data
  *     sequence <= its own (it targets a concrete already-written row).
  *
  * [[morRead]] models exactly that resolution as two anti joins, and
  * the latest-state table FALLS OUT of the sequence rule alone — no
  * latest-per-key `max_by` is needed, because every superseded row has
  * a higher-sequence equality delete covering it. SequenceMorSpec
  * proves the read path row-identical to the copy-on-write spelling
  * ([[graft.cdc.Merge.compact]] over the equivalent change log), which
  * is the v2-format invariant: MOR and COW are two physical layouts of
  * one logical table — and that the strict < lets a same-sequence
  * upsert survive its own delete, the clause the whole upsert mode
  * hangs on.
  *
  * Scale: both resolutions are the joins Iceberg's own Spark reader
  * performs. The equality-delete anti join shuffles (key, seq) pairs —
  * delete files are small relative to data, and on a real cluster the
  * delete side broadcasts per file group; the position-delete anti join
  * keys on (file, pos), i.e. it never touches row content. The
  * sequence comparison rides as a residual predicate on the hash join,
  * not a theta join.
  */
object MorQueries {

  /** Commit history over the customer fixture, modeled as three tables:
    * data rows (file_id, pos, seq, key, cols), equality deletes
    * (seq, key), position deletes (seq, file_id, pos).
    *
    *   seq 1  snapshot      data file 1: every key, pos = custkey
    *                        (snapshot writes key-sorted; fixture keys
    *                        are dense, so pos == key — documented
    *                        modeling shortcut)
    *   seq 2  upsert wave   keys k%3=0: eq-delete(k) + data file 2 row
    *                        with acctbal+100 (same commit, same seq)
    *   seq 3  delete wave   keys k%7=0: eq-delete only
    *   seq 4  pos deletes   file 1, pos p%13=0 (a maintenance-style
    *                        targeted row kill, e.g. GDPR erasure by
    *                        file/offset)
    */
  private def dataFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
    val snap = base
      .select(lit(1L).as("file_id"), col("c_custkey").as("pos"),
        lit(1L).as("seq"), col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"))
    val upsert = base.filter(col("c_custkey") % 3 === 0)
      .select(lit(2L).as("file_id"), col("c_custkey").as("pos"),
        lit(2L).as("seq"), col("c_custkey"), col("c_name"),
        col("c_nationkey"), (col("c_acctbal") + 100.0).as("c_acctbal"))
    snap.unionAll(upsert)
  }

  private def eqDeletes(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.load(spark, sfDir, "customer").select("c_custkey")
    keys.filter(col("c_custkey") % 3 === 0)
      .select(lit(2L).as("del_seq"), col("c_custkey").as("del_key"))
      .unionAll(keys.filter(col("c_custkey") % 7 === 0)
        .select(lit(3L).as("del_seq"), col("c_custkey").as("del_key")))
  }

  private def posDeletes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 13 === 0)
      .select(lit(4L).as("del_seq"), lit(1L).as("del_file"),
        col("c_custkey").as("del_pos"))

  /** The merge-on-read resolution: data minus sequence-covered deletes. */
  def morRead(spark: SparkSession, sfDir: String): DataFrame = {
    val live = dataFiles(spark, sfDir)
      .join(eqDeletes(spark, sfDir),
        col("c_custkey") === col("del_key") && col("seq") < col("del_seq"),
        "left_anti")
      .join(posDeletes(spark, sfDir),
        col("file_id") === col("del_file") && col("pos") === col("del_pos")
          && col("seq") <= col("del_seq"),
        "left_anti")
    live.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Final state derived arithmetically: a key's visible row is its
    * upsert image if k%3=0 else its snapshot image; k%7=0 is
    * eq-deleted at seq 3 (covers BOTH file 1 seq-1 and file 2 seq-2
    * rows); the pos delete additionally kills file-1 rows at pos%13=0 —
    * which are live only for keys not already upserted (k%3≠0, whose
    * snapshot row was eq-deleted) nor deleted (k%7=0).
    */
  val morReadOracle: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |  ROUND(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
      |             ELSE c_acctbal END, 2) AS c_acctbal
      |FROM customer
      |WHERE c_custkey % 7 <> 0
      |  AND NOT (c_custkey % 3 <> 0 AND c_custkey % 13 = 0)
      |ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_mor_sequence" -> morRead)

  def oracles: Map[String, String] = Map(
    "cdc_mor_sequence" -> morReadOracle)
}
