package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.catalog.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier B catalog + source/sink demonstration queries.
  *
  * `catalog_ddl` replays the reference's lakehouse bootstrap
  * (init_for_test.py:86-101): conditional namespace + two parquet
  * tables + SHOW TABLES LIKE existence checks, re-run idempotently.
  *
  * `sink_formats` exercises the write-format matrix (B2 append writes
  * + the packaged-but-unused ORC capability, SURVEY §1.2): the same
  * frame round-trips through parquet / csv / json / orc and each
  * read-back must agree with the source on count and checksum.
  * (No spark-avro datasource jar ships in this environment — only
  * avro-core — so avro is the one matrix row that stays out.)
  */
object CatalogQueries {

  def catalogDdl(spark: SparkSession, sfDir: String): DataFrame = {
    val whDir = Files.createTempDirectory("graft-cat-wh-")
    Warehouse.createNamespaceIfNotExists(spark, "cdc",
      whDir.resolve("cdc").toString)
    val account = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_name").as("email"))
    val product = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("product_id"), col("p_name").as("name"))
    // Idempotent bootstrap, run twice on purpose (IF NOT EXISTS path).
    (1 to 2).foreach { _ =>
      Warehouse.createTableIfNotExists(spark, "cdc.commerce_account",
        account.schema, whDir.resolve("cdc/commerce_account").toString)
      Warehouse.createTableIfNotExists(spark, "cdc.commerce_product",
        product.schema, whDir.resolve("cdc/commerce_product").toString)
    }
    val shown = Warehouse.showTablesLike(spark, "cdc", "commerce_*")
      .select(col("tableName").as("table_name"))
    shown.withColumn("exists_probe",
      lit(Warehouse.tableExists(spark, "cdc", "commerce_account") &&
        Warehouse.tableExists(spark, "cdc", "commerce_product") &&
        !Warehouse.tableExists(spark, "cdc", "commerce_nope")))
      .orderBy("table_name")
  }

  val catalogDdlOracle: String =
    """SELECT 'commerce_account' AS table_name, true AS exists_probe
      |UNION ALL
      |SELECT 'commerce_product', true
      |ORDER BY table_name""".stripMargin

  def sinkFormats(spark: SparkSession, sfDir: String): DataFrame = {
    val out = Files.createTempDirectory("graft-sink-")
    // Pre-rounded projection so text formats (csv/json) serialize the
    // exact same value the checksum compares.
    val src = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("bal"))
    val formats = Seq("parquet", "csv", "json", "orc")
    val perFmt = formats.map { fmt =>
      val dir = out.resolve(fmt).toString
      // B2 — append-mode write, split in two appends like the
      // reference's insert waves (test_cdc.py:55-73).
      src.filter(col("c_custkey") % 2 === 0)
        .write.mode("append").format(fmt)
        .option("header", "true").save(dir)
      src.filter(col("c_custkey") % 2 =!= 0)
        .write.mode("append").format(fmt)
        .option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .options(if (fmt == "csv") Map("header" -> "true")
                 else Map.empty[String, String])
        .schema(src.schema).load(dir)
      back.agg(lit(fmt).as("fmt"), count(lit(1)).as("n"),
        round(sum("bal"), 2).as("bal_sum"))
    }
    perFmt.reduce(_.unionAll(_)).orderBy("fmt")
  }

  val sinkFormatsOracle: String =
    """WITH s AS (SELECT count(*) AS n,
      |  ROUND(sum(ROUND(c_acctbal, 2)), 2) AS bal_sum FROM customer)
      |SELECT fmt, n, bal_sum FROM s,
      |  (SELECT unnest(['csv','json','orc','parquet']) AS fmt)
      |ORDER BY fmt""".stripMargin

  /** ONE-PASS table profiling — the data-quality sweep every ingest
    * runs before trusting a new drop: per column, non-null count,
    * exact distinct count, and min/max, for a mixed numeric / string /
    * timestamp column set, emitted long-format (one row per column).
    *
    * The whole profile is ONE aggregate over ONE scan — the naive
    * per-column loop would scan the table k times, the difference
    * between one pass and a day of I/O at 100 TB. The wide 1-row
    * result pivots to long format with an in-row explode of literal
    * structs (no union of re-scanning branches). Multi-column exact
    * COUNT(DISTINCT) plans one Expand (×4 rows) over the scan — still
    * one I/O pass; swap `approx_count_distinct` when the corpus is
    * huge and ±2% is acceptable. Numerics/timestamps report min/max
    * as doubles (timestamps as epoch micros), strings as strings —
    * engine-neutral, no float-formatting ambiguity.
    */
  def profileTable(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = Tables.load(spark, sfDir, "lineitem")
      .agg(
        count(col("l_partkey")).as("pk_n"),
        countDistinct(col("l_partkey")).as("pk_d"),
        min("l_partkey").cast("double").as("pk_min"),
        max("l_partkey").cast("double").as("pk_max"),
        count(col("l_quantity")).as("qt_n"),
        countDistinct(col("l_quantity")).as("qt_d"),
        min("l_quantity").cast("double").as("qt_min"),
        max("l_quantity").cast("double").as("qt_max"),
        count(col("l_shipdate")).as("sd_n"),
        countDistinct(col("l_shipdate")).as("sd_d"),
        // fixture timestamps are NTZ; session tz is UTC so the cast is
        // a no-op reinterpretation (Relational.tsMicros precedent).
        unix_micros(min(col("l_shipdate")).cast("timestamp"))
          .cast("double").as("sd_min"),
        unix_micros(max(col("l_shipdate")).cast("timestamp"))
          .cast("double").as("sd_max"),
        count(col("l_returnflag")).as("rf_n"),
        countDistinct(col("l_returnflag")).as("rf_d"),
        min("l_returnflag").as("rf_min"),
        max("l_returnflag").as("rf_max"))
    def row(name: String, p: String, str: Boolean) = struct(
      lit(name).as("col_name"),
      col(s"${p}_n").as("n_nonnull"),
      col(s"${p}_d").as("n_distinct"),
      (if (str) lit(null).cast("double") else col(s"${p}_min")).as("min_num"),
      (if (str) lit(null).cast("double") else col(s"${p}_max")).as("max_num"),
      (if (str) col(s"${p}_min") else lit(null).cast("string")).as("min_str"),
      (if (str) col(s"${p}_max") else lit(null).cast("string")).as("max_str"))
    wide.select(explode(array(
        row("l_partkey", "pk", str = false),
        row("l_quantity", "qt", str = false),
        row("l_shipdate", "sd", str = false),
        row("l_returnflag", "rf", str = true))).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  val profileTableOracle: String =
    """SELECT 'l_partkey' AS col_name, count(l_partkey) AS n_nonnull,
      |  count(DISTINCT l_partkey) AS n_distinct,
      |  CAST(min(l_partkey) AS DOUBLE) AS min_num,
      |  CAST(max(l_partkey) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', count(l_quantity), count(DISTINCT l_quantity),
      |  CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
      |  NULL, NULL
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_shipdate', count(l_shipdate), count(DISTINCT l_shipdate),
      |  CAST(epoch_us(min(l_shipdate)) AS DOUBLE),
      |  CAST(epoch_us(max(l_shipdate)) AS DOUBLE), NULL, NULL
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_returnflag', count(l_returnflag),
      |  count(DISTINCT l_returnflag), NULL, NULL,
      |  min(l_returnflag), max(l_returnflag)
      |FROM lineitem
      |ORDER BY col_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "catalog_ddl" -> catalogDdl,
    "sink_formats" -> sinkFormats,
    "profile_table" -> profileTable)

  def oracles: Map[String, String] = Map(
    "catalog_ddl" -> catalogDdlOracle,
    "sink_formats" -> sinkFormatsOracle,
    "profile_table" -> profileTableOracle)
}
