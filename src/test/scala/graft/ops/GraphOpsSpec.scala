package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the link-analysis family: mass conservation on the
  * fixture graph, and hand-checkable structure on a constructed one.
  */
class GraphOpsSpec extends SparkTestBase {

  test("pagerank conserves mass and ranks every co-supplier node") {
    val rows = GraphOps.pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("rank")).sum
    // Symmetric graph, no dangling mass: ranks sum to 1 up to the 9dp
    // per-iteration rounding (≤ nodes × 1e-9 per round).
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
    assert(rows.forall(_.getAs[Double]("rank") > 0.0))
    spark.catalog.clearCache()
  }

  test("triangles on a constructed graph: K3 + pendant counts exactly") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graphops").toString
    // Order 1 links {a,b,c} (a triangle); order 2 links {c,d} (a
    // pendant edge): a,b,c sit in exactly one triangle, d in none.
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 30L), (2L, 40L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 1L, 20L -> 1L, 30L -> 1L),
      "each K3 corner counts once; the pendant vertex never appears")
    spark.catalog.clearCache()
  }

  test("triangles: every count positive and 3 divides the corner total") {
    val rows = GraphOps.triangles(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_tri") > 0L))
    // Summing per-corner counts gives exactly 3 per triangle.
    assert(rows.map(_.getAs[Long]("n_tri")).sum % 3 === 0L)
    spark.catalog.clearCache()
  }

  test("bfs: single seed at 0; hops bounded; every labeled node has a " +
      "sparsified-graph neighbor exactly one hop closer") {
    import org.apache.spark.sql.functions._
    val dist = GraphOps.graphBfs(spark, sf).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Int]("hops")).toMap
    assert(dist.values.count(_ == 0) === 1, "exactly the seed at hop 0")
    assert(dist(0L) === 0, "the seed is supplier 0")
    assert(dist.values.forall(h => h >= 0 && h <= 3), "hop bound holds")

    // Independent witness: rebuild the top-3 sparsified symmetric
    // edge list (the oracle's und CTE, in DataFrame form) and check
    // the BFS labeling is sound (a neighbor one hop closer exists)
    // and complete (no labeled node's neighbor is closer than h-1).
    val os = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    val wt = os.as("a").join(os.as("b"),
        col("a.o") === col("b.o") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("u"), col("b.s").as("v"))
      .agg(count(lit(1)).as("w"))
    val da = wt.select(col("u").as("x"), col("v").as("other"), col("w"))
      .union(wt.select(col("v").as("x"), col("u").as("other"), col("w")))
    val und = da.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("x")
            .orderBy(col("w").desc, col("other"))))
      .filter(col("rn") <= 3)
      .select(least(col("x"), col("other")).as("u"),
        greatest(col("x"), col("other")).as("v"))
      .distinct().collect()
    val nbrs = (und.map(r => r.getLong(0) -> r.getLong(1)) ++
      und.map(r => r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    dist.filter(_._2 > 0).foreach { case (n, h) =>
      val ds = nbrs(n).flatMap(dist.get)
      assert(ds.min === h - 1,
        s"node $n labeled $h must have min neighbor label ${h - 1}, " +
          s"got ${ds.min}")
    }
    spark.catalog.clearCache()
  }

  test("pagerank on a star graph: hub outranks leaves, leaves tie") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graphops").toString
    // Orders {1: a,b}, {2: a,c} → edges a↔b, a↔c: 'a' is the hub.
    Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.pagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(10L, 20L, 30L))
    assert(out(10L)._1 === 2L, "hub has out-degree 2")
    assert(out(20L) === out(30L), "symmetric leaves must tie exactly")
    assert(out(10L)._2 > out(20L)._2, "hub must outrank leaves")
    spark.catalog.clearCache()
  }
}
