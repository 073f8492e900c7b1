package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link-analysis operators. [[LlmOps.dedupComponents]] covers
  * the transitive-closure family (min-label propagation); this adds the
  * weighted-propagation family — PageRank — which web-corpus curation
  * uses as a document-importance prior (rank the crawl graph, weight or
  * gate documents by their host/page centrality: the Common Crawl
  * preprocessing lineage popularized by Page et al. 1999).
  *
  * The fixture graph is the co-supplier graph: suppliers are linked
  * when they serve the same order (the lineitem→order co-occurrence),
  * symmetric by construction, so every ranked node has out-edges and
  * the dangling-mass correction drops out of the power iteration.
  */
object GraphOps {

  private val Damping = 0.85
  private val PrIters = 3

  /** PageRank, [[PrIters]] power iterations, damping 0.85. Every stage
    * is the partitioning-friendly spelling of distributed PageRank:
    * the edge list (src, dst, outdeg) is built once and persisted —
    * each iteration joins the rank frame (node-cardinality) to it ON
    * src and partial-aggregates the pushed mass per dst, so iteration
    * cost is one co-partitionable equi-join + one map-side-combined
    * sum; nothing ever materializes N² pairs. Ranks are rounded to
    * 9 dp between iterations (the k-means centroid discipline) so the
    * power-iteration state — and therefore every downstream compare —
    * is engine-identical; the node count rides a broadcast 1-row
    * aggregate, never a driver collect.
    */
  def pagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val os = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    val edges = os.as("a").join(os.as("b"),
        col("a.o") === col("b.o") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) built once; 3 iterations + the final select
    // all read it.
    val edgesW = edges.join(deg, Seq("src")).persist()
    val nCnt = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.select(col("src").as("node"))
      .crossJoin(broadcast(nCnt))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = edgesW.join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("outdeg")).as("mass"))
        .crossJoin(broadcast(nCnt))
        .select(col("dst").as("node"),
          round(lit(1.0 - Damping) / col("n") +
            lit(Damping) * col("mass"), 9).as("r"))
    }
    ranks.join(deg, col("node") === col("src"))
      .select(col("node").as("s_suppkey"), col("outdeg"),
        round(col("r"), 6).as("rank"))
      .orderBy("s_suppkey")
  }

  private def prIterSql(prev: String, out: String): String =
    s"""$out AS (
      |  SELECT e.dst AS node,
      |    round(CAST(0.15 AS DOUBLE) / n +
      |      CAST(0.85 AS DOUBLE) * sum(r.r / e.outdeg), 9) AS r
      |  FROM ew e JOIN $prev r ON r.node = e.src, n
      |  GROUP BY e.dst, n.n
      |)""".stripMargin

  val pagerankOracle: String =
    s"""WITH os AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      |), ed AS (
      |  SELECT DISTINCT a.s AS src, b.s AS dst
      |  FROM os a JOIN os b ON a.o = b.o AND a.s <> b.s
      |), deg AS (
      |  SELECT src, count(*) AS outdeg FROM ed GROUP BY src
      |), ew AS (
      |  SELECT ed.src, ed.dst, deg.outdeg FROM ed JOIN deg USING (src)
      |), n AS (SELECT count(*) AS n FROM deg),
      |r0 AS (
      |  SELECT src AS node, CAST(1.0 AS DOUBLE) / n AS r FROM deg, n
      |), ${prIterSql("r0", "r1")},
      |${prIterSql("r1", "r2")},
      |${prIterSql("r2", "r3")}
      |SELECT r3.node AS s_suppkey, deg.outdeg, round(r3.r, 6) AS rank
      |FROM r3 JOIN deg ON r3.node = deg.src
      |ORDER BY s_suppkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank)

  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle)
}
