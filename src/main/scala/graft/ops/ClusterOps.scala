package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-cluster operators: spherical k-means (the IVF/SemDeDup
  * training step), cluster-scoped semantic dedup (SemDeDup, Abbas et
  * al. 2023 — arXiv:2303.09540), and int8 scalar quantization (the
  * memory/IO lever that makes 100 TB ANN affordable). Complements the
  * [[LlmOps]] similarity stack: `labelCentroids` there uses the GIVEN
  * labels as the coarse quantizer; k-means LEARNS the partition when no
  * labels exist — which is the production case for web-scale corpora.
  *
  * Determinism contract (shared with every oracle-checked operator):
  * centroids are rounded to 6 dp BETWEEN iterations, similarities to
  * 6 dp BEFORE any argmax/threshold, and ties break on the lower
  * cluster id — so Spark and DuckDB run bit-identical assignment
  * decisions and the fixpoint state is engine-independent.
  */
object ClusterOps {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Fixture embedding dimensionality (TESTDATA: 64-dim floats). */
  private val EmbDim = 64
  private val K = 8
  private val Iters = 2

  private[graft] def embD(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def round6Vec(c: Column): Column =
    transform(c, x => round(x, 6))

  /** Deterministic seeding: the K lowest vec_ids, in id order, become
    * clusters 0..K-1. A TakeOrdered(K) — never a global sort — then a
    * K-row window to number them (metadata-sized by construction).
    */
  private def seedCentroids(e: DataFrame): DataFrame =
    e.orderBy("vec_id").limit(K)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("c"),
        round6Vec(col("v")).as("centroid"))

  /** One Lloyd assignment step: argmax cosine over the BROADCAST
    * centroid set, ties to the lower cluster id. The crossJoin is
    * map-side (K tiny rows broadcast); the argmax partial-aggregates as
    * `max(struct(cos, -c))`, so the shuffle carries ONE row per
    * (vec_id, map partition) — N rows total, never N·K. At 100 TB this
    * is the scan-shaped step Lloyd's algorithm repeats; K grows to
    * thousands and the centroid frame still broadcasts (K × dim
    * doubles ≪ executor memory).
    */
  private def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("c"),
        round(cosine(col("v"), col("centroid")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("c")).as("nc"))).as("m"),
        any_value(col("v")).as("v"))
      .select(col("vec_id"), col("v"), (-col("m.nc")).as("c"),
        col("m.cos").as("cos"))

  /** Recenter: per-cluster per-dimension mean as EmbDim agg buffers in
    * ONE hash aggregate (the [[LlmOps]] labelCentroids shape — never a
    * 64× posexplode shuffle), rounded to 6 dp so the next iteration's
    * inputs are engine-identical.
    */
  private def recenter(assigned: DataFrame): DataFrame = {
    val dims = (1 to EmbDim).map(i =>
      avg(element_at(col("v"), i)).as(s"m$i"))
    assigned.groupBy("c")
      .agg(dims.head, dims.tail: _*)
      .select(col("c"),
        array((1 to EmbDim).map(i => round(col(s"m$i"), 6)): _*)
          .as("centroid"))
  }

  /** Final (vec_id, v, c, cos) assignment after [[Iters]] Lloyd rounds.
    * The embedding frame is persisted — each iteration re-reads it for
    * assignment (Iters+1 passes total; the SparkEntry caller contract
    * covers the cache drop).
    */
  private[ops] def kmeansAssigned(spark: SparkSession,
      sfDir: String): DataFrame = {
    val e = embD(spark, sfDir).persist()
    var cent = seedCentroids(e)
    for (_ <- 1 to Iters) cent = recenter(assign(e, cent))
    assign(e, cent)
  }

  /** Spherical k-means (k=8, 2 Lloyd iterations, deterministic lowest-id
    * seeding): per-cluster size, exact membership pinned by `id_sum`,
    * and mean assignment cosine. The UNSUPERVISED twin of
    * `llm_sim_centroids`: this is how the IVF coarse quantizer is
    * trained when no label column exists, and the clustering SemDeDup
    * prunes with. Every step is scan-shaped: broadcast centroids,
    * map-side argmax, one partial-aggregated rollup per iteration —
    * no step materializes more than K × dim values outside the scans.
    */
  def clusterKmeans(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssigned(spark, sfDir)
      .groupBy(col("c").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum("vec_id").as("id_sum"),
        round(avg(col("cos")), 6).as("mean_cos"))
      .withColumnRenamed("c", "cluster")
      .orderBy("cluster")

  /** DuckDB twin of one assignment step, parameterized by the centroid
    * CTE name; `rn = 1` under (cos DESC, c ASC) == Spark's
    * max(struct(cos, -c)).
    */
  private def assignSql(cents: String, out: String): String =
    s"""$out AS (
      |  SELECT vec_id, v, c, cos FROM (
      |    SELECT vec_id, v, c, cos,
      |      row_number() OVER (PARTITION BY vec_id
      |                         ORDER BY cos DESC, c) AS rn
      |    FROM (
      |      SELECT e.vec_id, e.v, s.c,
      |        ROUND(list_dot_product(e.v, s.cent) /
      |          (sqrt(list_dot_product(e.v, e.v)) *
      |           sqrt(list_dot_product(s.cent, s.cent))), 6) AS cos
      |      FROM e, $cents s))
      |  WHERE rn = 1
      |)""".stripMargin

  private def recenterSql(assigned: String, out: String): String =
    s"""$out AS (
      |  SELECT c, list(m ORDER BY i) AS cent
      |  FROM (SELECT a.c, i.i, round(avg(v[i.i]), 6) AS m
      |        FROM $assigned a,
      |             (SELECT unnest(generate_series(1, $EmbDim)) AS i) i
      |        GROUP BY a.c, i.i)
      |  GROUP BY c
      |)""".stripMargin

  /** The unrolled-iteration CTE prefix shared by [[clusterKmeansOracle]]
    * and [[dedupSemanticOracle]]: seeds → (assign → recenter) ×2 →
    * final assign as `a3`.
    */
  private val kmeansCtesSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), s0 AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
      |         list_transform(v, x -> round(x, 6)) AS cent
      |  FROM e ORDER BY vec_id LIMIT $K
      |), ${assignSql("s0", "a1")},
      |${recenterSql("a1", "c1")},
      |${assignSql("c1", "a2")},
      |${recenterSql("a2", "c2")},
      |${assignSql("c2", "a3")}""".stripMargin

  val clusterKmeansOracle: String =
    s"""$kmeansCtesSql
      |SELECT c AS cluster, count(*) AS n_vecs,
      |  CAST(sum(vec_id) AS BIGINT) AS id_sum,
      |  round(avg(cos), 6) AS mean_cos
      |FROM a3 GROUP BY c ORDER BY cluster""".stripMargin

  /** SemDeDup similarity cut — calibrated like `llm_dedup_embed`'s: the
    * fixture plants no true near-dups (max pairwise cosine ≈ 0.51), so
    * the cut selects the most-similar tail to keep the decision shape
    * exercised; production recalibrates per corpus.
    */
  private val SemThreshold = 0.4

  /** Census cap on cluster size for the pairwise stage (the LlmOps
    * bucket-cap discipline): a degenerate corpus collapsing into one
    * giant cluster must not detonate into all-pairs.
    */
  private val SemMaxCluster = 4000

  /** Semantic dedup (SemDeDup): candidate pairs are scoped to k-means
    * CLUSTERS — the semantic-neighborhood prune — then each pair above
    * the cosine cut drops its higher vec_id, keeping the lowest-id
    * partner. Differs from `llm_dedup_embed`'s sign-bucket LSH prune in
    * recall shape: LSH buckets split near-dups across bucket
    * boundaries; cluster scoping keeps semantic neighborhoods intact
    * (and is what the published pipeline runs). Pairwise work is
    * bounded per cluster by the census cap; at 100 TB, K scales with
    * corpus size to hold cluster cardinality ≈ corpus/K under the cap,
    * so the quadratic term never exceeds cap² per cluster.
    */
  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    // Persisted: the census, and BOTH sides of the pair self-join,
    // consume this frame — without the pin each branch would re-run
    // the full 3-assignment Lloyd DAG (the SparkEntry caller contract
    // covers the cache drop).
    val a = kmeansAssigned(spark, sfDir).select("vec_id", "v", "c")
      .persist()
    val ok = a.groupBy("c").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, SemMaxCluster))
      .select("c")
    val inb = a.join(broadcast(ok), Seq("c"))
    inb.as("x").join(inb.as("y"),
        col("x.c") === col("y.c") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        round(cosine(col("x.v"), col("y.v")), 6).as("cos"))
      .filter(col("cos") >= SemThreshold)
      .groupBy(col("v2").as("dropped"))
      .agg(min("v1").as("kept_for"), count(lit(1)).as("n_pairs"),
        max("cos").as("max_cos"))
      .orderBy("dropped")
  }

  val dedupSemanticOracle: String =
    s"""$kmeansCtesSql, okc AS (
      |  SELECT c FROM a3 GROUP BY c
      |  HAVING count(*) BETWEEN 2 AND $SemMaxCluster
      |), inb AS (
      |  SELECT a3.vec_id, a3.v, a3.c FROM a3 JOIN okc USING (c)
      |), pairs AS (
      |  SELECT x.vec_id AS v1, y.vec_id AS v2,
      |    ROUND(list_dot_product(x.v, y.v) /
      |      (sqrt(list_dot_product(x.v, x.v)) *
      |       sqrt(list_dot_product(y.v, y.v))), 6) AS cos
      |  FROM inb x JOIN inb y ON x.c = y.c AND x.vec_id < y.vec_id
      |)
      |SELECT v2 AS dropped, min(v1) AS kept_for, count(*) AS n_pairs,
      |  max(cos) AS max_cos
      |FROM pairs WHERE cos >= $SemThreshold
      |GROUP BY v2 ORDER BY dropped""".stripMargin

  /** Reconstruction-quality floor for [[embedQuantize]] — int8 symmetric
    * quantization of N(0, 0.15) vectors reconstructs to cosine ≈ 0.9999;
    * the gate trips if quantization ever degrades below this.
    */
  private val QuantCosFloor = 0.999

  /** Int8 symmetric scalar quantization of the embedding column — the
    * 4× memory/IO compression that makes a 100 TB vector corpus fit a
    * serving tier. One metadata aggregate computes the GLOBAL max-abs
    * scale (1 row, broadcast back via crossJoin — the
    * profile_histogram bounds pattern); quantize, dequantize and the
    * reconstruction-cosine check are all in-row transforms on the same
    * scan. Self-checking (the agg_approx_distinct pattern): exact
    * integral `sum_q` pins the quantized values, `recon_cos` is
    * hash-matched at 6 dp, and the boolean gate asserts the
    * reconstruction floor — DuckDB recomputes all three from the same
    * IEEE ops, so any engine divergence in the rounding contract shows
    * as a hash mismatch, not a silent drift.
    */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embD(spark, sfDir)
    val scale = e.agg(max(array_max(transform(col("v"), x => abs(x))))
      .as("s"))
    e.crossJoin(broadcast(scale))
      .select(col("vec_id"),
        col("v"),
        col("s"),
        transform(col("v"), x => round(x * lit(127.0) / col("s"), 0)
          .cast("long")).as("q"))
      .select(col("vec_id"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        round(cosine(col("v"),
          transform(col("q"), x => x * col("s") / lit(127.0))), 6)
          .as("recon_cos"))
      .withColumn("ok", col("recon_cos") >= QuantCosFloor)
      .orderBy("vec_id")
  }

  val embedQuantizeOracle: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), sc AS (
      |  SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s FROM e
      |), q AS (
      |  SELECT vec_id, v, s,
      |    list_transform(v, x -> CAST(round(x * 127.0 / s) AS BIGINT)) AS q
      |  FROM e, sc
      |), d AS (
      |  SELECT vec_id,
      |    CAST(list_aggregate(q, 'sum') AS BIGINT) AS sum_q,
      |    ROUND(list_dot_product(v, list_transform(q, x -> x * s / 127.0)) /
      |      (sqrt(list_dot_product(v, v)) *
      |       sqrt(list_dot_product(list_transform(q, x -> x * s / 127.0),
      |                             list_transform(q, x -> x * s / 127.0)))),
      |      6) AS recon_cos
      |  FROM q
      |)
      |SELECT vec_id, sum_q, recon_cos, recon_cos >= $QuantCosFloor AS ok
      |FROM d ORDER BY vec_id""".stripMargin

  // ------------------------------------------------- product quantization

  /** PQ geometry: 64 dims split into [[PqM]] subspaces of [[PqDim]],
    * each quantized against its own [[PqK]]-codeword codebook — 4
    * code bytes per vector vs 256 raw-float bytes, the 64× compression
    * that lets a 100 TB vector corpus keep its index in memory
    * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search"). One Lloyd refinement per subspace trains the codebooks.
    */
  private[graft] val PqM = 4
  private val PqDim = 16
  private val PqK = 8
  private val PqC = 50

  private[graft] def pqSub(v: Column, m: Int): Column =
    slice(v, m * PqDim + 1, PqDim)

  /** Train subspace `m`'s codebook: lowest-id seeding + one Lloyd
    * round, the [[kmeansAssigned]] recipe on the subvector slice; the
    * result is COLLECTED — K × PqDim doubles, metadata-sized at any
    * corpus scale (production trains on a sample for the same reason).
    */
  private[graft] def pqCodebook(e: DataFrame, m: Int): Seq[Seq[Double]] = {
    val sub = e.select(col("vec_id"), pqSub(col("v"), m).as("sv"))
    val seed = sub.orderBy("vec_id").limit(PqK)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("k"),
        round6Vec(col("sv")).as("cw"))
    val assigned = sub.crossJoin(broadcast(seed))
      .select(col("vec_id"), col("sv"), col("k"),
        round(cosine(col("sv"), col("cw")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("k")).as("nk"))).as("mx"),
        any_value(col("sv")).as("sv"))
      .select((-col("mx.nk")).as("k"), col("sv"))
    val dims = (1 to PqDim).map(i => avg(element_at(col("sv"), i)).as(s"m$i"))
    assigned.groupBy("k").agg(dims.head, dims.tail: _*)
      .select(col("k"),
        array((1 to PqDim).map(i => round(col(s"m$i"), 6)): _*).as("cw"))
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toSeq).toSeq
  }

  /** In-row encoder for subspace `m`: argmax cosine against the K
    * LITERAL codewords, ties to the lower code — pure codegen'd
    * expressions over the scan, no join, no shuffle. This is the
    * production encode shape: codebooks are tiny and ship to every
    * executor; encoding 100 TB is one map-only pass.
    */
  private[graft] def pqEncode(sv: Column, cb: Seq[Seq[Double]]): Column = {
    val scored = array(cb.zipWithIndex.map { case (cw, k) =>
      struct(
        round(cosine(sv, array(cw.map(lit): _*)), 6).as("cos"),
        lit(-k).as("nk"))
    }: _*)
    (-array_max(scored).getField("nk")).cast("int")
  }

  /** PRODUCT-QUANTIZED ANN with asymmetric distance computation — the
    * classic IVFADC scoring half, run end-to-end: train M per-subspace
    * codebooks, encode every vector to M small codes scan-locally,
    * score candidates by ADC — the query's dot product against each
    * subspace codeword is PRECOMPUTED into an M×K table (inner product
    * is additive across subspaces, so the approximate score is M table
    * lookups + adds per row, never a 64-dim float op) — keep the
    * top-[[PqC]] by ADC and re-rank them against the exact cosine.
    *
    * 100 TB shape: training collects K×M×PqDim doubles (metadata);
    * encode and ADC are in-row literal expressions on one scan; the
    * only ordering work is TakeOrdered top-C then top-10. Determinism:
    * codebooks and every score round to 6 dp before any argmax/rank,
    * ties break on vec_id — the DuckDB oracle re-derives codebooks,
    * codes, ADC table and both rankings from the same rounded
    * arithmetic.
    */
  def simPq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embD(spark, sfDir).persist()
    val books = (0 until PqM).map(m => pqCodebook(e, m))
    val q = e.filter(col("vec_id") === 0).select("v")
      .head.getSeq[Double](0).toSeq
    // ADC table: round6(dot(q_m, cw_mk)) — M×K driver-side doubles,
    // the same left-to-right product sum DuckDB's list_dot_product
    // runs (the joinBloom / profile_histogram embed-as-literal shape).
    val adcTable: Seq[Seq[Double]] = (0 until PqM).map { m =>
      val qm = q.slice(m * PqDim, (m + 1) * PqDim)
      books(m).map { cw =>
        BigDecimal(qm.lazyZip(cw).map(_ * _).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("p"))
    val coded = e.filter(col("vec_id") =!= 0)
      .select(Seq(col("vec_id"), col("v")) ++ (0 until PqM).map(m =>
        pqEncode(pqSub(col("v"), m), books(m)).as(s"k$m")): _*)
    val adc = round((0 until PqM).map(m =>
        element_at(array(adcTable(m).map(lit): _*), col(s"k$m") + 1))
      .reduce(_ + _), 6)
    coded.withColumn("adc", adc)
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(PqC)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("adc"),
        round(cosine(col("v"), col("p")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** The PQ pipeline unrolled in SQL, shared by [[simPqOracle]] and
    * [[simPqRecallOracle]]: per subspace — seed, one Lloyd assign +
    * recenter, the ADC entry table — then per-vector codes and the
    * ADC ranking. `cand` is the top-C pool, `pq10` the re-ranked 10.
    */
  private[graft] def pqLo(m: Int): Int = m * PqDim + 1
  private[graft] def pqHi(m: Int): Int = (m + 1) * PqDim

  /** Subspace-`m` codebook-training CTEs (`s${m}0` seed → `a$m` Lloyd
    * assign → `c$m` recenter) over a CTE named `e` (vec_id,
    * v DOUBLE[]) — the SQL twin of [[pqCodebook]], shared by the
    * search oracle here and the CDC code-maintenance oracle
    * ([[graft.queries.PqCdcQueries]]), so the two can't drift.
    */
  private[graft] def pqBookCtes(m: Int): String =
    s"""s${m}0 AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k,
      |    list_transform(v[${pqLo(m)}:${pqHi(m)}], x -> round(x, 6)) AS cw
      |  FROM e ORDER BY vec_id LIMIT $PqK
      |), a$m AS (
      |  SELECT k, sv FROM (
      |    SELECT s.k, x.sv,
      |      row_number() OVER (PARTITION BY x.vec_id
      |                         ORDER BY ROUND(list_dot_product(x.sv, s.cw) /
      |        (sqrt(list_dot_product(x.sv, x.sv)) *
      |         sqrt(list_dot_product(s.cw, s.cw))), 6) DESC, s.k) AS rn
      |    FROM (SELECT vec_id, v[${pqLo(m)}:${pqHi(m)}] AS sv FROM e) x, s${m}0 s)
      |  WHERE rn = 1
      |), c$m AS (
      |  SELECT k, list(mv ORDER BY i) AS cw
      |  FROM (SELECT a.k, i.i, round(avg(sv[i.i]), 6) AS mv
      |        FROM a$m a,
      |             (SELECT unnest(generate_series(1, $PqDim)) AS i) i
      |        GROUP BY a.k, i.i)
      |  GROUP BY k
      |)""".stripMargin

  private val pqCtesSql: String = {
    def lo(m: Int) = pqLo(m)
    def hi(m: Int) = pqHi(m)
    val perM = (0 until PqM).map { m =>
      s"""${pqBookCtes(m)}, d$m AS (
        |  SELECT c.k, round(list_dot_product(p[${lo(m)}:${hi(m)}], c.cw), 6) AS d
        |  FROM c$m c, probe
        |), e$m AS (
        |  SELECT vec_id, k FROM (
        |    SELECT x.vec_id, c.k,
        |      row_number() OVER (PARTITION BY x.vec_id
        |                         ORDER BY ROUND(list_dot_product(x.sv, c.cw) /
        |        (sqrt(list_dot_product(x.sv, x.sv)) *
        |         sqrt(list_dot_product(c.cw, c.cw))), 6) DESC, c.k) AS rn
        |    FROM (SELECT vec_id, v[${lo(m)}:${hi(m)}] AS sv
        |          FROM e WHERE vec_id <> 0) x, c$m c)
        |  WHERE rn = 1
        |)""".stripMargin
    }.mkString(",\n")
    val adcSum = (0 until PqM).map(m => s"d$m.d").mkString(" + ")
    val joins = (0 until PqM).map(m =>
      s"JOIN e$m ON e$m.vec_id = e.vec_id " +
        s"JOIN d$m ON d$m.k = e$m.k").mkString(" ")
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), probe AS (
      |  SELECT v AS p FROM e WHERE vec_id = 0
      |),
      |$perM,
      |scored AS (
      |  SELECT e.vec_id, e.v, round($adcSum, 6) AS adc
      |  FROM e $joins
      |), cand AS (
      |  SELECT vec_id, v, adc FROM scored
      |  ORDER BY adc DESC, vec_id LIMIT $PqC
      |), pq10 AS (
      |  SELECT vec_id, adc,
      |    ROUND(list_dot_product(v, p) /
      |      (sqrt(list_dot_product(v, v)) *
      |       sqrt(list_dot_product(p, p))), 6) AS cos
      |  FROM cand, probe
      |  ORDER BY cos DESC, vec_id LIMIT 10
      |)""".stripMargin
  }

  val simPqOracle: String =
    s"""$pqCtesSql
      |SELECT vec_id, adc, cos FROM pq10 ORDER BY cos DESC, vec_id""".stripMargin

  /** recall@10 of the PQ/ADC search against the exact brute-force
    * baseline ([[graft.ops.LlmOps.simTopk]]) — published beside the
    * IVF and sketch-re-rank recalls so all three approximate paths
    * carry a measured quality number.
    */
  def simPqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = LlmOps.simTopk(spark, sfDir).select("vec_id")
    exact.join(simPq(spark, sfDir).select("vec_id"), Seq("vec_id"))
      .agg(count(lit(1)).as("hits"))
      .select(lit("pq_adc").as("method"), lit(10).as("k"), col("hits"),
        round(col("hits").cast("double") / 10, 2).as("recall"))
  }

  val simPqRecallOracle: String =
    s"""$pqCtesSql, exact AS (
      |  SELECT vec_id FROM e, probe WHERE vec_id <> 0
      |  ORDER BY ROUND(list_dot_product(v, p) /
      |    (sqrt(list_dot_product(v, v)) *
      |     sqrt(list_dot_product(p, p))), 6) DESC, vec_id LIMIT 10
      |)
      |SELECT 'pq_adc' AS method, 10 AS k, count(*) AS hits,
      |  ROUND(CAST(count(*) AS DOUBLE) / 10, 2) AS recall
      |FROM exact JOIN pq10 USING (vec_id)""".stripMargin

  // --------------------------------------------- IVF-PQ (residual ADC)

  /** IVF-PQ with RESIDUAL encoding — the canonical composed index
    * (FAISS IndexIVFPQ; Jégou et al. 2011 §IV): the coarse quantizer
    * (per-label centroids, the [[graft.ops.LlmOps.simIvf]] lists)
    * removes each vector's cluster mean, and PQ codebooks are trained
    * on the RESIDUALS — which carry far less variance than raw
    * vectors, so the same 4 code bytes quantize much finer. Search
    * probes the nprobe=2 nearest lists and scores each probed list
    * with its OWN ADC table (the probe's residual differs per
    * centroid — the asymmetric-distance subtlety that distinguishes
    * IVFADC from flat PQ), then exact-re-ranks the top-[[PqC]].
    *
    * 100 TB shape: centroids and codebooks are metadata (broadcast /
    * literals); residual computation is one `zip_with` over the scan;
    * encode is in-row literal argmax; the probed fraction is
    * nprobe/nlist of the corpus and each probed row costs M lookups +
    * adds. Every float that feeds an argmax or rank is rounded to
    * 6 dp first, so the DuckDB oracle re-derives centroids,
    * residuals, codebooks, codes, per-list ADC tables and both
    * rankings bit-for-bit.
    */
  def simIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val e0 = t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v0"))
      .persist()
    val dims = (1 to EmbDim).map(i =>
      round(avg(element_at(col("v0"), i)), 6).as(s"m$i"))
    val cent = e0.groupBy("label").agg(dims.head, dims.tail: _*)
      .select(col("label"),
        array((1 to EmbDim).map(i => col(s"m$i")): _*).as("cw"))
    val res = e0.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        zip_with(col("v0"), col("cw"), (a, b) => round(a - b, 6)).as("v"))
      .persist()
    val books = (0 until PqM).map(m => pqCodebook(res, m))

    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosSeq(a: Seq[Double], b: Seq[Double]): Double =
      round6(a.lazyZip(b).map(_ * _).sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    // Probe + coarse top-2: K centroid rows — metadata, same
    // legitimacy as the broadcast codebooks.
    val p = e0.filter(col("vec_id") === 0).select("v0")
      .head.getSeq[Double](0).toSeq
    val best2 = cent.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .map { case (l, c) => (l, c, cosSeq(p, c)) }
      .sortBy { case (l, _, s) => (-s, l) }.take(2)

    val scored = best2.map { case (lab, cvec, _) =>
      val qres = p.lazyZip(cvec).map((a, b) => round6(a - b)).toSeq
      val adcTable = (0 until PqM).map { m =>
        val qm = qres.slice(m * PqDim, (m + 1) * PqDim)
        books(m).map(cw => round6(qm.lazyZip(cw).map(_ * _).sum))
      }
      res.filter(col("label") === lab && col("vec_id") =!= 0)
        .select(Seq(col("vec_id")) ++ (0 until PqM).map(m =>
          pqEncode(pqSub(col("v"), m), books(m)).as(s"k$m")): _*)
        .select(col("vec_id"),
          round((0 until PqM).map(m =>
              element_at(array(adcTable(m).map(lit): _*), col(s"k$m") + 1))
            .reduce(_ + _), 6).as("adc"))
    }.reduce(_.unionAll(_))

    val probeDf = e0.filter(col("vec_id") === 0).select(col("v0").as("pv"))
    scored.orderBy(col("adc").desc, col("vec_id")).limit(PqC)
      .join(e0.select(col("vec_id"), col("v0")), Seq("vec_id"))
      .crossJoin(broadcast(probeDf))
      .select(col("vec_id"), col("adc"),
        round(cosine(col("v0"), col("pv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** The IVF-PQ pipeline unrolled in SQL: rounded per-label centroids,
    * residuals, the shared [[pqBookCtes]] codebook training over the
    * residual CTE `e`, per-vector codes, per-probed-list ADC tables,
    * and the ADC → exact-re-rank funnel restricted to the two probed
    * lists.
    */
  private val ivfPqCtesSql: String = {
    def lo(m: Int) = pqLo(m)
    def hi(m: Int) = pqHi(m)
    val perM = (0 until PqM).map { m =>
      s"""${pqBookCtes(m)}, enc$m AS (
        |  SELECT vec_id, k FROM (
        |    SELECT x.vec_id, c.k,
        |      row_number() OVER (PARTITION BY x.vec_id
        |                         ORDER BY ROUND(list_dot_product(x.sv, c.cw) /
        |        (sqrt(list_dot_product(x.sv, x.sv)) *
        |         sqrt(list_dot_product(c.cw, c.cw))), 6) DESC, c.k) AS rn
        |    FROM (SELECT vec_id, v[${lo(m)}:${hi(m)}] AS sv
        |          FROM e WHERE vec_id <> 0) x, c$m c)
        |  WHERE rn = 1
        |), dt$m AS (
        |  SELECT qr.label, c.k,
        |    round(list_dot_product(qr.q[${lo(m)}:${hi(m)}], c.cw), 6) AS d
        |  FROM c$m c, qr
        |)""".stripMargin
    }.mkString(",\n")
    val adcSum = (0 until PqM).map(m => s"dt$m.d").mkString(" + ")
    val joins = (0 until PqM).map(m =>
      s"JOIN enc$m ON enc$m.vec_id = e.vec_id " +
        s"JOIN dt$m ON dt$m.k = enc$m.k AND dt$m.label = e.label")
      .mkString(" ")
    s"""WITH raw AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v0 FROM embeddings
      |), cent AS (
      |  SELECT label, list(m ORDER BY i) AS cw FROM (
      |    SELECT label, i.i, round(avg(v0[i.i]), 6) AS m
      |    FROM raw, (SELECT unnest(generate_series(1, $EmbDim)) AS i) i
      |    GROUP BY label, i.i)
      |  GROUP BY label
      |), e AS (
      |  SELECT r.vec_id, r.label,
      |    list_transform(list_zip(r.v0, c.cw),
      |                   x -> round(x[1] - x[2], 6)) AS v
      |  FROM raw r JOIN cent c ON c.label = r.label
      |), probe AS (
      |  SELECT v0 AS p FROM raw WHERE vec_id = 0
      |), best2 AS (
      |  SELECT c.label, c.cw FROM cent c, probe
      |  ORDER BY ROUND(list_dot_product(c.cw, p) /
      |    (sqrt(list_dot_product(c.cw, c.cw)) *
      |     sqrt(list_dot_product(p, p))), 6) DESC, c.label
      |  LIMIT 2
      |), qr AS (
      |  SELECT b.label,
      |    list_transform(list_zip(p, b.cw), x -> round(x[1] - x[2], 6)) AS q
      |  FROM best2 b, probe
      |),
      |$perM,
      |scored AS (
      |  SELECT e.vec_id, round($adcSum, 6) AS adc
      |  FROM e JOIN best2 ON best2.label = e.label $joins
      |  WHERE e.vec_id <> 0
      |), cand AS (
      |  SELECT vec_id, adc FROM scored ORDER BY adc DESC, vec_id LIMIT $PqC
      |), ivfpq10 AS (
      |  SELECT r.vec_id, cand.adc,
      |    ROUND(list_dot_product(r.v0, p) /
      |      (sqrt(list_dot_product(r.v0, r.v0)) *
      |       sqrt(list_dot_product(p, p))), 6) AS cos
      |  FROM cand JOIN raw r ON r.vec_id = cand.vec_id, probe
      |  ORDER BY cos DESC, r.vec_id LIMIT 10
      |)""".stripMargin
  }

  val simIvfPqOracle: String =
    s"""$ivfPqCtesSql
      |SELECT vec_id, adc, cos FROM ivfpq10 ORDER BY cos DESC, vec_id""".stripMargin

  /** recall@10 of IVF-PQ against the exact brute-force baseline —
    * published beside the IVF, PQ and sketch recalls so the composed
    * index carries its own measured quality number.
    */
  def simIvfPqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = LlmOps.simTopk(spark, sfDir).select("vec_id")
    exact.join(simIvfPq(spark, sfDir).select("vec_id"), Seq("vec_id"))
      .agg(count(lit(1)).as("hits"))
      .select(lit("ivf_pq").as("method"), lit(10).as("k"), col("hits"),
        round(col("hits").cast("double") / 10, 2).as("recall"))
  }

  val simIvfPqRecallOracle: String =
    s"""$ivfPqCtesSql, exact AS (
      |  SELECT vec_id FROM raw, probe WHERE vec_id <> 0
      |  ORDER BY ROUND(list_dot_product(v0, p) /
      |    (sqrt(list_dot_product(v0, v0)) *
      |     sqrt(list_dot_product(p, p))), 6) DESC, vec_id LIMIT 10
      |)
      |SELECT 'ivf_pq' AS method, 10 AS k, count(*) AS hits,
      |  ROUND(CAST(count(*) AS DOUBLE) / 10, 2) AS recall
      |FROM exact JOIN ivfpq10 USING (vec_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_cluster_kmeans" -> clusterKmeans,
    "llm_dedup_semantic" -> dedupSemantic,
    "llm_embed_quantize" -> embedQuantize,
    "llm_sim_pq" -> simPq,
    "llm_sim_pq_recall" -> simPqRecall,
    "llm_sim_ivfpq" -> simIvfPq,
    "llm_sim_ivfpq_recall" -> simIvfPqRecall)

  def oracles: Map[String, String] = Map(
    "llm_cluster_kmeans" -> clusterKmeansOracle,
    "llm_dedup_semantic" -> dedupSemanticOracle,
    "llm_embed_quantize" -> embedQuantizeOracle,
    "llm_sim_pq" -> simPqOracle,
    "llm_sim_pq_recall" -> simPqRecallOracle,
    "llm_sim_ivfpq" -> simIvfPqOracle,
    "llm_sim_ivfpq_recall" -> simIvfPqRecallOracle)
}
