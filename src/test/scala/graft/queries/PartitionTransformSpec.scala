package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hidden-partitioning transforms (`maintenance_partition_transform`):
  * the planner must prune transformed directories from predicates on
  * the RAW columns only, each spec epoch by its OWN transform, and
  * the union-by-spec read must equal the untransformed table.
  */
class PartitionTransformSpec extends SparkTestBase {

  test("raw-column predicates prune each epoch by its own transform; " +
      "union-by-spec equals the full table") {
    // Build both epoch layouts through the query itself.
    val result = MaintenanceQueries.partitionTransform(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("revenue"))).toMap
    val (e0, e1) = MaintenanceQueries.ptEpochDirs(sf)

    // Custkey equality prunes epoch 0 to exactly ONE of its 8 bucket
    // dirs; epoch 1 has no custkey transform, so ALL month dirs stay.
    val probe = graft.Tables.load(spark, sf, "orders")
      .agg(min("o_custkey")).head().getLong(0)
    val (b0, b1) = MaintenanceQueries.ptPlan(spark, sf, Some(probe), None)
    val allMonths = spark.read.parquet(e1)
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
    assert(b0.size == 1 && b0.head.contains("/p_bucket="),
      s"bucket predicate must prune to one dir, got $b0")
    assert(b1.size == allMonths.toInt,
      s"epoch 1 has no custkey transform; expected all $allMonths " +
        s"month dirs, got ${b1.size}")

    // Date range prunes epoch 1 to exactly the in-window months;
    // epoch 0 (bucket spec) keeps its dirs for the residual filter.
    val (w0, w1) =
      MaintenanceQueries.ptPlan(spark, sf, None, Some(("1997-07-01", "1998-06-30")))
    val expectMonths = (1 to 6).map(m => f"1998-$m%02d")
    assert(w1.map(_.split("p_month=").last).sorted == expectMonths,
      s"expected months $expectMonths, got $w1")
    assert(w0.size == 8, s"epoch 0 keeps its 8 bucket dirs, got ${w0.size}")

    // Answers equal the untransformed table (residuals make pruning
    // exact regardless of spec).
    val orders = graft.Tables.load(spark, sf, "orders")
    val fullLookup = orders.filter(col("o_custkey") === probe)
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).head()
    assert(result("bucket_lookup") ==
      ((fullLookup.getLong(0), fullLookup.getDouble(1))))
    val fullWindow = orders
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).head()
    assert(result("month_window") ==
      ((fullWindow.getLong(0), fullWindow.getDouble(1))))

    // Spec evolution left both epochs complete: the two layouts
    // together hold every order exactly once.
    val n0 = spark.read.parquet(e0).count()
    val n1 = spark.read.parquet(e1).count()
    assert(n0 + n1 == orders.count(), "epochs must partition the table")
    assert(n0 > 0 && n1 > 0, "both spec epochs must hold data")
  }
}
