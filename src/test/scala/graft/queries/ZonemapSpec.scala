package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Proves `layout_zonemap` actually SKIPS files (the point of the
  * operator) and that skipping never changes the answer.
  */
class ZonemapSpec extends SparkTestBase {

  test("zone map prunes most year-files; pruned answer == full scan") {
    // Materialize the layout + run the pruned query once.
    val pruned = MaintenanceQueries.layoutZonemap(spark, sf).collect()

    // Re-derive the file selection through the same helper the query
    // used, against the layout it actually wrote.
    val (kept, total) = MaintenanceQueries.zonemapKeptFiles(spark,
      MaintenanceQueries.zonemapLaidDir(sf), "1996-04-01", "1997-03-31")
    assert(total >= 5, s"expected one file per year, got $total")
    assert(kept.length == 2,
      s"a 12-month window must touch exactly 2 year-files, kept ${kept.length}/$total")

    // Ground truth from the ORIGINAL table, no layout, no pruning.
    val full = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")
      .collect()
    assert(pruned.map(_.toString).toSeq == full.map(_.toString).toSeq,
      "pruned scan must be answer-identical to the full scan")
  }
}
