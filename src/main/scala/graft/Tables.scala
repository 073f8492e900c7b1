package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. One place that knows the on-disk layout
  * (`<sfDir>/<table>.parquet`, TESTDATA.md) so queries only name tables.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")
}
