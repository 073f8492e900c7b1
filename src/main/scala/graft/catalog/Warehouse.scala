package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Tier B catalog/DDL surface — the engine analog of the reference's
  * lakehouse bootstrap (init_for_test.py:81-101): conditional namespace
  * + table creation over parquet, existence checks via SHOW TABLES …
  * LIKE, all through `spark.catalog` / SQL DDL against the session
  * catalog.
  *
  * Tables are created with explicit LOCATION so the layout is the
  * path-convention warehouse (A16) rather than the session's default
  * warehouse dir — the same binding the reference declares via
  * `iceberg.catalog.warehouse` (connect-iceberg-sink.json:22-29).
  */
object Warehouse {

  /** B4 — `CREATE SCHEMA IF NOT EXISTS` (init_for_test.py:90-92). */
  def createNamespaceIfNotExists(spark: SparkSession, ns: String,
                                 location: String): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns " +
      s"LOCATION '${location.replace("'", "''")}'")

  /** B3/B4 — `CREATE TABLE IF NOT EXISTS … USING parquet`
    * (init_for_test.py:93-99). The schema DDL comes from the given
    * StructType — the engine's "auto-create from event schema" (A10)
    * reuses this with the change-stream's inferred schema.
    */
  def createTableIfNotExists(spark: SparkSession, fqn: String,
                             schema: StructType, location: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $fqn (${schema.toDDL}) " +
      s"USING parquet LOCATION '${location.replace("'", "''")}'")

  /** B5 — existence probe, exactly the reference's
    * `SHOW TABLES FROM … LIKE '<t>'` + row-count pattern
    * (init_for_test.py:81-84).
    */
  def tableExists(spark: SparkSession, ns: String, table: String): Boolean =
    showTablesLike(spark, ns, table).count() > 0

  /** B5 — `SHOW TABLES IN <ns> LIKE '<pattern>'`. */
  def showTablesLike(spark: SparkSession, ns: String,
                     pattern: String): DataFrame =
    spark.sql(s"SHOW TABLES IN $ns LIKE '${pattern.replace("'", "''")}'")
}
