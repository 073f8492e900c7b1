package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Parquet aggregate pushdown (`agg_pushdown`): under the DSv2 parquet
  * scan with `spark.sql.parquet.aggregatePushdown` on, COUNT/MIN/MAX
  * must resolve from row-group STATISTICS — the plan's scan node
  * carries a `PushedAggregation` block and no row-level aggregate
  * input remains. The registered query materializes inside the conf
  * window (the confs are session-global, so they cannot stay flipped);
  * this spec re-opens the window to assert the plan shape, then checks
  * the pushed answer equals the row-scan answer.
  */
class AggPushdownSpec extends SparkTestBase {

  test("COUNT/MIN/MAX are answered by PushedAggregation footer stats") {
    val prevAgg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
    try {
      val agg = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("min_okey"),
          max("l_orderkey").as("max_okey"))
      val p = agg.queryExecution.explainString(FormattedMode)
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate not pushed to the parquet scan:\n$p")
      assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_orderkey)"),
        "min/max must ride the footer stats")
      val pushed = agg.collect()(0)
      val scanned = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"))
        .collect()(0)
      assert(pushed === scanned,
        "footer-stat answer must equal the row-scan answer")
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevAgg)
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }
}
