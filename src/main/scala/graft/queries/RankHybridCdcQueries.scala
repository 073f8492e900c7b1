package graft.queries

import graft.cdc.StateStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HYBRID RETRIEVAL SERVED FROM THE CDC-MAINTAINED INDEXES — the
  * engine's flagship composition (VERDICT r16 #2): the production
  * shape of [[graft.ops.LlmOps.rankHybridAnn]], where neither leg
  * recomputes anything corpus-sized at query time. Both maintainers
  * drain the same change streams the sibling queries drain
  * (`cdc_bm25_vocab`'s document log, `cdc_ivf_incremental`'s
  * embedding log), and the query is SERVED from maintained state
  * alone:
  *
  *  - LEXICAL leg: [[Bm25VocabQueries.serveTerms]] over the term-keyed
  *    index — arbitrary query terms decided at serve time (this
  *    query's three-term set is disjoint from the build-time families
  *    as a SET), one narrow doc-index scan + a bucket-pruned
  *    vocabulary point read + the 1-row stats singleton.
  *  - VECTOR leg: IVF 2-probe over `cdc_ivf_incremental`'s maintained
  *    index — the (label → centroid) quantizer reassembled from the
  *    tiny index table (metadata-sized: |labels| × dim rows), the two
  *    best cells picked against a broadcast probe, and the postings
  *    scan confined to those cells by a filter that pushes to the
  *    parquet scan. A serving deployment additionally buckets
  *    postings BY LABEL so the cell filter prunes at the manifest;
  *    the state table here is bucketed by its merge key (vec_id), so
  *    the prune is scan-level, not file-level — the 100 TB note, not
  *    a correctness difference.
  *  - FUSE: the same RRF fold, rank for rank, as the batch hybrid
  *    ([[graft.ops.LlmOps.rrfFuse]]).
  *
  * What the ANN approximation costs is MEASURED, not assumed:
  * `cdc_rank_hybrid_recall` publishes fused recall@10 against the
  * exact-hybrid baseline computed over the SAME maintained state
  * (exact cosine over the full postings instead of the 2-probe scan),
  * beside the family's other recall audits.
  *
  * 100 TB: drain cost ∝ change volume (the sibling maintainers'
  * argument, unchanged); serve cost = one narrow doc-index scan +
  * one cell-pruned postings scan + three broadcast singletons. The
  * oracle is the batch hybrid over the post-change corpora — the
  * maintained serve must EQUAL what a from-scratch batch computation
  * would return.
  */
object RankHybridCdcQueries {

  /** Serve-time terms — a set neither maintained family was built
    * for (differs from `bm25Terms` and from the vocab family's
    * `QueryTerms`).
    */
  private[queries] val HybridTerms = Seq("table", "stream", "spark")

  private val AssignTable = "ivf.assignments"

  private def probeOf(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(graft.ops.LlmOps.vecD(col("embedding")).as("probe"))

  /** (label → centroid) reassembled from the maintained index table:
    * |labels| × dim rows → |labels| rows, each a dim-length array in
    * dimension order. Metadata-sized state, broadcast downstream.
    */
  private def centroidsOf(spark: SparkSession,
                          store: StateStore): DataFrame =
    IvfCdcQueries.readIndex(spark, store)
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("i"), col("m"))))
        .as("dims"))
      .select(col("label"),
        transform(col("dims"), d => d.getField("m")).as("centroid"))

  private def cos(a: Column, b: Column): Column =
    graft.ops.LlmOps.cosine(a, b)

  /** The IVF 2-probe vector leg off maintained state: best-2 cells by
    * centroid cosine, postings scan confined to them.
    */
  private def vecLegAnn(spark: SparkSession, store: StateStore,
                        probe: DataFrame): DataFrame = {
    val best2 = centroidsOf(spark, store).crossJoin(broadcast(probe))
      .select(col("label"), col("probe"),
        round(cos(col("centroid"), col("probe")), 6).as("ccos"))
      .orderBy(col("ccos").desc, col("label"))
      .limit(2)
      .select("label", "probe")
    store.currentState(spark, AssignTable)
      .filter(col("vec_id") =!= 0)
      .join(broadcast(best2), Seq("label"))
      .select(col("vec_id").as("doc_id"),
        round(cos(col("emb"), col("probe")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** The exact-cosine vector leg over the SAME maintained postings —
    * the recall audit's baseline (what the 2-probe scan approximates).
    */
  private def vecLegExact(spark: SparkSession, store: StateStore,
                          probe: DataFrame): DataFrame =
    store.currentState(spark, AssignTable)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(cos(col("emb"), col("probe")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** The two maintainers drain CONCURRENTLY (guide §2.6): they are
    * independent streaming queries over different staged logs into
    * disjoint stores, each on its own cloned session
    * ([[DrainHarness]]), so overlapping them turns the serve's drain
    * cost from (lexical + vector) into max(lexical, vector) — measured
    * 3.3 s + 2.8 s sequential in the r17 JobProf.
    */
  private def drainBoth(spark: SparkSession, sfDir: String,
                        filesPerTrigger: Int): (StateStore, StateStore) = {
    val both = graft.Par.run(Seq[() => StateStore](
      () => Bm25VocabQueries.runMaintenance(spark, sfDir, filesPerTrigger),
      () => IvfCdcQueries.runMaintenance(spark, sfDir, filesPerTrigger)))
    (both(0), both(1))
  }

  /** The registered serve: drain both maintainers, fuse the
    * maintained lexical and maintained-ANN vector legs.
    */
  def rankHybridCdc(spark: SparkSession, sfDir: String,
                    filesPerTrigger: Int = 2): DataFrame = {
    val (bmv, ivf) = drainBoth(spark, sfDir, filesPerTrigger)
    val probe = probeOf(spark, sfDir)
    graft.ops.LlmOps.rrfFuse(
      Bm25VocabQueries.serveTerms(spark, bmv, HybridTerms)
        .select("doc_id", "score"), "r_lex",
      vecLegAnn(spark, ivf, probe), "r_vec")
      .localCheckpoint(eager = true)
  }

  /** The audit row: fused recall@10 of the maintained-ANN hybrid
    * against the exact-hybrid over the same maintained state — one
    * drain, both hybrids, intersection count.
    */
  def rankHybridCdcRecall(spark: SparkSession, sfDir: String,
                          filesPerTrigger: Int = 2): DataFrame = {
    val (bmv, ivf) = drainBoth(spark, sfDir, filesPerTrigger)
    val probe = probeOf(spark, sfDir)
    val lex = Bm25VocabQueries.serveTerms(spark, bmv, HybridTerms)
      .select("doc_id", "score").localCheckpoint(eager = true)
    val ann = graft.ops.LlmOps.rrfFuse(lex, "r_lex",
      vecLegAnn(spark, ivf, probe), "r_vec").select("doc_id")
    val exact = graft.ops.LlmOps.rrfFuse(lex, "r_lex",
      vecLegExact(spark, ivf, probe), "r_vec").select("doc_id")
    exact.join(ann, Seq("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .select(lit(10).as("k"), col("hits"),
        round(col("hits").cast("double") / 10, 2).as("recall"))
      .localCheckpoint(eager = true)
  }

  // ------------------------------------------------------- oracles

  /** Post-change corpora CTEs shared by both oracles: `docs2` is the
    * document log's final state (the vocab family's CTE), `final` the
    * embedding log's (the IVF family's CTE).
    */
  private val corporaSql: String =
    """docs2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 'row row row data'
      |         WHEN doc_id % 3 = 0 THEN text || ' data table'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |), final AS (
      |  SELECT vec_id,
      |    CASE WHEN vec_id % 3 = 0 THEN label + 1000 ELSE label END AS label,
      |    CASE WHEN vec_id % 3 = 0
      |         THEN list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
      |         ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END
      |      AS emb
      |  FROM embeddings WHERE vec_id % 7 <> 0
      |), probe AS (
      |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p
      |  FROM embeddings WHERE vec_id = 0
      |), cents AS (
      |  SELECT label, list(ROUND(m, 6) ORDER BY i) AS centroid
      |  FROM (
      |    SELECT label, i.i AS i, avg(emb[i.i]) AS m
      |    FROM final, (SELECT unnest(generate_series(1, 64)) AS i) i
      |    GROUP BY label, i.i)
      |  GROUP BY label
      |), best AS (
      |  SELECT label FROM cents, probe
      |  ORDER BY ROUND(list_dot_product(centroid, p) /
      |    (sqrt(list_dot_product(centroid, centroid)) *
      |     sqrt(list_dot_product(p, p))), 6) DESC, label
      |  LIMIT 2
      |)""".stripMargin

  private def vecLegSql(pruned: Boolean): String = {
    val join = if (pruned) "JOIN best USING (label), probe" else ", probe"
    s"""  SELECT vec_id AS doc_id,
       |    ROUND(list_dot_product(f.emb, p) /
       |      (sqrt(list_dot_product(f.emb, f.emb)) *
       |       sqrt(list_dot_product(p, p))), 6) AS score
       |  FROM final f $join
       |  WHERE vec_id <> 0
       |  ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  private def lexLegSql: String =
    s"""  WITH ${graft.ops.LlmOps.bm25BodySqlFor("docs2", HybridTerms)}"""

  val rankHybridCdcOracle: String =
    s"""WITH $corporaSql, la AS (
       |$lexLegSql
       |), lb AS (
       |${vecLegSql(pruned = true)}
       |),
       |${graft.ops.LlmOps.rrfFuseSql("r_lex", "r_vec")}""".stripMargin

  val rankHybridCdcRecallOracle: String =
    s"""WITH $corporaSql, la AS (
       |$lexLegSql
       |), ex AS (
       |  WITH lb AS (
       |${vecLegSql(pruned = false)}
       |  ),
       |  ${graft.ops.LlmOps.rrfFuseSql("r_lex", "r_vec")}
       |), an AS (
       |  WITH lb AS (
       |${vecLegSql(pruned = true)}
       |  ),
       |  ${graft.ops.LlmOps.rrfFuseSql("r_lex", "r_vec")}
       |)
       |SELECT 10 AS k, count(*) AS hits,
       |  ROUND(CAST(count(*) AS DOUBLE) / 10, 2) AS recall
       |FROM ex JOIN an USING (doc_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_rank_hybrid" -> ((s, d) => rankHybridCdc(s, d)),
    "cdc_rank_hybrid_recall" -> ((s, d) => rankHybridCdcRecall(s, d)))

  def oracles: Map[String, String] = Map(
    "cdc_rank_hybrid" -> rankHybridCdcOracle,
    "cdc_rank_hybrid_recall" -> rankHybridCdcRecallOracle)
}
