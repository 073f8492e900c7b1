package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: writing both join sides bucketed on
  * the join key lets Spark plan the join with NO shuffle exchange on
  * either side — the pre-partitioning strategy a 100 TB deployment
  * uses for its hottest recurring join (SURVEY §2 "bucketing for
  * co-located joins"). Asserted from the physical plan, not vibes.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // (warehouse dir is a static conf — managed test tables go to the
    // session default and are dropped below.)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // Disable auto-broadcast so the test proves bucketing (not a
    // broadcast) removed the exchanges.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.load(spark, sf, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.explainString(FormattedMode)
      // Count distinct Exchange NODES (formatted mode prints each node
      // in the tree and again in the details section).
      val exchanges = "Exchange \\((\\d+)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSet.size
      // The only allowed exchange is the final 5-row aggregation
      // shuffle; the join itself must read both sides pre-partitioned.
      assert(exchanges <= 1, s"expected at most the agg exchange, plan:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "join must be a shuffle-class join fed by bucketed scans")
      // And the answer matches the unbucketed join.
      val want = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("join_bucketed's staged twins: the bare join stage has ZERO " +
      "exchanges (the agg shuffle is the query's only one)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = ops.Relational.bucketedJoinFrame(spark, sf)
        .queryExecution.explainString(FormattedMode)
      assert(!p.contains("Exchange"),
        s"bucketed join stage must not shuffle either side, plan:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "join must be a shuffle-class join fed by bucketed scans")
      // The identical plain-parquet join shuffles BOTH sides — the
      // cost the ingest-time bucketing retired.
      val twin = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
        .queryExecution.explainString(FormattedMode)
      val exchanges = "Exchange \\((\\d+)\\)".r
        .findAllMatchIn(twin).map(_.group(1)).toSet.size
      assert(exchanges >= 2,
        s"plain-parquet twin should shuffle both sides, plan:\n$twin")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
