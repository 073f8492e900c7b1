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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "catalog_ddl" -> catalogDdl,
    "sink_formats" -> sinkFormats)

  def oracles: Map[String, String] = Map(
    "catalog_ddl" -> catalogDdlOracle,
    "sink_formats" -> sinkFormatsOracle)
}
