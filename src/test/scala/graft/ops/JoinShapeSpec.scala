package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Semantic identities for the correlated-subquery join shapes — the
  * semi/anti formulations must equal their naive join+distinct
  * counterparts on any input (the plans differ; the relations must not).
  */
class JoinShapeSpec extends SparkTestBase {

  test("join_q4: semi join equals join+distinct on the same predicate") {
    val viaSemi = Relational.joinQ4(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val naive = orders
      .join(Tables.load(spark, sf, "lineitem")
          .filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaSemi == naive,
      s"semi-join result $viaSemi diverged from join+distinct $naive")
  }

  test("join_q21: every blamed supplier has its R lines sole in some order") {
    val blamed = Relational.joinQ21(spark, sf).collect()
    assert(blamed.nonEmpty, "fixture must produce at least one sole-blame row")
    blamed.foreach(r => assert(r.getLong(1) > 0))
    // Counts are bounded by the supplier's own R-line count.
    val li = Tables.load(spark, sf, "lineitem")
    val rPerSupp = li.filter(col("l_returnflag") === "R")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .join(Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    blamed.foreach { r =>
      val cap = rPerSupp.getOrElse(r.getString(0), 0L)
      assert(r.getLong(1) <= cap,
        s"${r.getString(0)}: numwait ${r.getLong(1)} exceeds its R lines $cap")
    }
  }
}
