package graft.queries

import graft.Tables
import graft.cdc.{Merge, MergeCommit, StateStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** TERM-KEYED CDC-maintained BM25 index — [[Bm25CdcQueries]] grown up:
  * that pipeline's 1-row stats hard-codes df columns for the fixed
  * 3-term query, so it can serve exactly one query. Real BM25 serving
  * keys document frequency BY TERM, so ANY query works. Three tables
  * stay current through the same document change stream:
  *
  *  - `bmv.docs` — per-document features: `dl` and the full term-count
  *    map `tc` (computed SCAN-LOCAL on batch rows via
  *    `map_from_arrays(array_distinct(words), tf per distinct word)` —
  *    no explode/shuffle for feature extraction, raw text never
  *    reaches state). Ordered merge, the standard recipe.
  *  - `bmv.vocab` — the (term → df) VOCABULARY, additive state under
  *    the [[AggCdcQueries]] telescoping-delta discipline: each batch
  *    explodes the map KEYS of old/new stored winners (±1 per term,
  *    batch keys only — a batch-sized explode, never the corpus),
  *    folds them to per-term LONG deltas, and upserts the affected
  *    vocab buckets. Terms whose df reaches 0 leave the vocabulary.
  *  - `bmv.stats` — 1-row (N, Σ|d|) plus the `docs_v`/`vocab_v`
  *    version stamps, committed LAST: any crash between the three
  *    commits leaves a stamp mismatch, and the retry rebuilds vocab +
  *    stats from the docs index instead of freezing a zero delta in
  *    (the torn-batch discipline both sibling pipelines carry).
  *
  * Serving an arbitrary-terms query: the query's terms semi-join the
  * vocabulary (vocab-sized scan → a |q|-row frame pivoted to ONE row
  * of df columns), crossJoin the 1-row stats, and score one scan of
  * the doc index with `element_at(tc, term)` per query term — the
  * same closed form, same IEEE fold order, as the batch scorer
  * ([[graft.ops.LlmOps.bm25TopKN]]). 100 TB: batch cost ∝ change
  * volume; vocab state ∝ vocabulary (Heaps' law, millions of rows,
  * not corpus-sized); query cost = one narrow index scan + two
  * broadcast singletons — and the query TERMS are a runtime input,
  * not a build-time constant.
  */
object Bm25VocabQueries {

  private val NBuckets = 8
  private val DocsTable = "bmv.docs"
  private val VocabTable = "bmv.vocab"
  private val StatsTable = "bmv.stats"

  /** The served query — four terms, disjoint from the fixed 3-term
    * family, proving the index answers queries it was never built for.
    */
  private[queries] val QueryTerms = Seq("spark", "stream", "merge", "query")

  private def termCounts = {
    val w = split(col("text"), " ")
    val dw = array_distinct(w)
    map_from_arrays(dw, transform(dw, t => size(filter(w, x => x === t))))
      .cast("map<string,int>")
  }

  private[queries] def processBatch(store: StateStore,
                                    batch: DataFrame): Unit =
    processBatchImpl(store, batch, skipDerived = false)

  /** CRASH INJECTION for the spec: docs merge commits, vocab + stats
    * never run.
    */
  private[queries] def mergeWithoutDerived(store: StateStore,
                                           batch: DataFrame): Unit =
    processBatchImpl(store, batch, skipDerived = true)

  private def processBatchImpl(store: StateStore, batch: DataFrame,
                               skipDerived: Boolean): Unit = {
    val spark = batch.sparkSession
    val compacted = Merge.compactKeepTombstones(batch, Seq("doc_id")).persist()
    try {
      val meta = MergeCommit.toBatchMeta(compacted, Seq("doc_id"), NBuckets)
      val featMeta = meta
        .withColumn("dl", size(split(col("text"), " ")))
        .withColumn("tc", termCounts)
        .select(col("doc_id"), col("dl"), col("tc"),
          col(StateStore.TsCol), col(StateStore.SeqCol),
          col(StateStore.DeletedCol), col(StateStore.BucketCol))
      val preDocsV = store.currentVersion(DocsTable).toLong
      val preVocabV = store.currentVersion(VocabTable).toLong
      val result = MergeCommit.mergeBatchMeta(store, DocsTable, featMeta,
        Seq("doc_id"), persistSlices = true)
        .getOrElse(return)
      try {
        if (skipDerived) return
        val stored: Option[(Long, Long, Long, Long)] =
          if (store.exists(StatsTable))
            store.currentState(spark, StatsTable)
              .select("n", "sdl", "docs_v", "vocab_v").head() match {
                case r => Some((r.getLong(0), r.getLong(1), r.getLong(2),
                  r.getLong(3)))
              }
          else None
        val consistent = stored match {
          case Some((_, _, dv, vv)) => dv == preDocsV && vv == preVocabV
          case None => preDocsV < 0 // stats absent only pre-bootstrap
        }
        val keys = featMeta.select("doc_id").distinct()
        val (nextN, nextSdl) =
          if (consistent) {
            // Scalar stats deltas, kicked off CONCURRENTLY with the
            // vocabulary branch below (graft.Par — independent reads
            // of the same persisted slices; only the stats COMMIT has
            // to wait, for the vocab version it stamps).
            def contrib(state: DataFrame, sign: Int): DataFrame =
              state.join(keys, Seq("doc_id"), "left_semi")
                .filter(!col(StateStore.DeletedCol))
                .select(lit(sign.toLong).as("dn"),
                  (col("dl").cast("long") * sign).as("ddl"))
            val fScalar = graft.Par.future {
              contrib(result.preSlice, -1)
                .unionAll(contrib(result.postSlice, +1))
                .agg(coalesce(sum("dn"), lit(0L)).as("dn"),
                  coalesce(sum("ddl"), lit(0L)).as("ddl"))
                .head()
            }
            // Vocabulary deltas: ±1 per (stored winner, distinct term)
            // over the batch's keys — stale losers cancel exactly.
            // Wrapped in Try so a vocab failure still JOINS the scalar
            // future before propagating (the Par await-all rule: no
            // stray action in flight when the caller unwinds).
            val vocabTry = scala.util.Try {
              def termContrib(state: DataFrame, sign: Int): DataFrame =
                state.join(keys, Seq("doc_id"), "left_semi")
                  .filter(!col(StateStore.DeletedCol))
                  .select(explode(map_keys(col("tc"))).as("term"))
                  .withColumn("dd", lit(sign.toLong))
              val tDeltas = termContrib(result.preSlice, -1)
                .unionAll(termContrib(result.postSlice, +1))
                .groupBy("term").agg(sum("dd").as("dd"))
                .filter(col("dd") =!= 0L)
                .withColumn(StateStore.BucketCol,
                  StateStore.bucketExpr(Seq("term"), NBuckets))
                .persist()
              val affected = tDeltas.select(StateStore.BucketCol).distinct()
                .collect().map(_.getInt(0)).toSeq.sorted
              if (affected.nonEmpty) {
                val vState =
                  if (store.exists(VocabTable))
                    store.readBuckets(spark, VocabTable, affected)
                  else spark.createDataFrame(
                    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                    StructType.fromDDL("term string, df bigint, _bucket int"))
                val next = vState.join(tDeltas.drop(StateStore.BucketCol),
                    Seq("term"), "full_outer")
                  .select(col("term"),
                    (coalesce(col("df"), lit(0L)) +
                      coalesce(col("dd"), lit(0L))).as("df"))
                  .filter(col("df") > 0) // df 0 → the term leaves the vocab
                  .withColumn(StateStore.BucketCol,
                    StateStore.bucketExpr(Seq("term"), NBuckets))
                store.commit(spark, VocabTable, next, affected)
              }
              tDeltas.unpersist(blocking = false)
            }
            val dTry = scala.util.Try(graft.Par.await(fScalar))
            vocabTry.get // rethrow vocab failure first (scalar joined)
            val d = dTry.get
            val (pn, psdl) = stored.map(s => (s._1, s._2)).getOrElse((0L, 0L))
            (pn + d.getLong(0), psdl + d.getLong(1))
          } else {
            // Torn batch: rebuild vocabulary + stats from the index.
            rebuildVocab(spark, store)
            val r = store.currentState(spark, DocsTable)
              .agg(count(lit(1)).cast("long").as("n"),
                coalesce(sum(col("dl").cast("long")), lit(0L)).as("sdl"))
              .head()
            (r.getLong(0), r.getLong(1))
          }
        import spark.implicits._
        val nextStats = Seq((0, nextN, nextSdl,
            store.currentVersion(DocsTable).toLong,
            store.currentVersion(VocabTable).toLong))
          .toDF("stat_id", "n", "sdl", "docs_v", "vocab_v")
          .withColumn(StateStore.TsCol, lit(0L))
          .withColumn(StateStore.SeqCol, lit(0L))
          .withColumn(StateStore.DeletedCol, lit(false))
          .withColumn(StateStore.BucketCol, lit(0))
        store.commit(spark, StatsTable, nextStats, Seq(0))
      } finally result.unpersist()
    } finally compacted.unpersist(blocking = false)
  }

  /** From-scratch vocabulary recompute off the doc index — the
    * torn-batch recovery path and the spec's equality baseline.
    */
  private[queries] def rebuildVocab(spark: SparkSession,
                                    store: StateStore): Int = {
    val rebuilt = store.currentState(spark, DocsTable)
      .select(explode(map_keys(col("tc"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn(StateStore.BucketCol,
        StateStore.bucketExpr(Seq("term"), NBuckets))
      .persist()
    val rebuiltBuckets = rebuilt.select(StateStore.BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq
    // Recovery must be TOTAL (VERDICT r16 #3): a wave can empty a
    // bucket (every term hashing there left the vocabulary), and the
    // rebuild then owns FEWER buckets than the stale manifest. Those
    // buckets are part of the rebuild's truth — commit them as EMPTY
    // (stageCommit publishes a metadata-only file) rather than
    // refusing; a recovery path that throws on a legal state freezes
    // the divergence in.
    val affected = (rebuiltBuckets ++ (if (store.exists(VocabTable))
        store.manifest(VocabTable).keySet.toSeq
      else Seq.empty[Int])).distinct.sorted
    try store.commit(spark, VocabTable, rebuilt, affected)
    finally rebuilt.unpersist(blocking = false)
  }

  private[queries] def runMaintenance(spark: SparkSession, sfDir: String,
      filesPerTrigger: Int): StateStore =
    DrainHarness.drain(spark,
      Bm25CdcQueries.docChangeLog(Tables.load(spark, sfDir, "documents")),
      s"$sfDir/bm25v", NBuckets, filesPerTrigger)(processBatch)

  /** Bench's untimed staging warmup. */
  def prestage(spark: SparkSession, sfDir: String): Unit =
    DrainHarness.stage(
      Bm25CdcQueries.docChangeLog(Tables.load(spark, sfDir, "documents")),
      s"$sfDir/bm25v")

  /** The registered query: drain the log, then serve [[QueryTerms]] —
    * a query the index was never specialized for — from maintained
    * state alone: one doc-index scan + a |q|-row vocab probe pivoted
    * to a broadcast singleton.
    */
  def bm25VocabIncremental(spark: SparkSession, sfDir: String,
                           filesPerTrigger: Int = 2): DataFrame = {
    val store = runMaintenance(spark, sfDir, filesPerTrigger)
    serveTerms(spark, store, QueryTerms).localCheckpoint(eager = true)
  }

  /** The ARBITRARY-TERMS serve off a drained store — what makes the
    * term-keyed index an index: any term list, decided at query time.
    * One doc-index scan + a bucket-pruned vocab point-read pivoted to
    * a broadcast singleton + the 1-row stats; shared by the
    * registered query above and the CDC-maintained hybrid's lexical
    * leg ([[RankHybridCdcQueries]]).
    */
  private[queries] def serveTerms(spark: SparkSession, store: StateStore,
                                  terms: Seq[String]): DataFrame = {
    val feat = store.currentState(spark, DocsTable)
      .select(col("doc_id") +: col("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          coalesce(element_at(col("tc"), lit(t)), lit(0)).as(s"tf${i + 1}")
        }: _*)
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("df"))), lit(0L))
        .as(s"df${i + 1}") }
    // Bucket-pruned vocab probe: the query terms' buckets are known
    // up front (the same bucketExpr the maintainer assigns with), so
    // the df lookup reads |distinct term buckets| dirs — a point read
    // against a vocabulary of millions, not a vocab scan.
    import spark.implicits._
    val termBuckets = terms.toDF("term")
      .select(StateStore.bucketExpr(Seq("term"), NBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val dfRow = store.readBuckets(spark, VocabTable, termBuckets)
      .filter(col("term").isin(terms: _*))
      .agg(dfCols.head, dfCols.tail: _*)
    val stats = store.currentState(spark, StatsTable).select("n", "sdl")
    graft.ops.LlmOps.bm25TopKN(feat, stats.crossJoin(dfRow), terms.size)
  }

  /** Maintained-state instrument for the spec: (vocab as a map, stats
    * scalars) and their rebuilt-from-index equivalents.
    */
  private[queries] def vocabAndRebuild(spark: SparkSession,
      store: StateStore): ((Map[String, Long], Seq[Long]),
                           (Map[String, Long], Seq[Long])) = {
    val v = store.rawState(spark, VocabTable)
      .select("term", "df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = store.currentState(spark, StatsTable)
      .select("n", "sdl").head()
    val rv = store.currentState(spark, DocsTable)
      .select(explode(map_keys(col("tc"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rs = store.currentState(spark, DocsTable)
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("sdl"))
      .head()
    ((v, Seq(s.getLong(0), s.getLong(1))),
      (rv, Seq(rs.getLong(0), rs.getLong(1))))
  }

  /** The batch BM25 body for [[QueryTerms]] over the post-change
    * corpus — the same corpus CTE as the 3-term twin.
    */
  val bm25VocabOracle: String =
    """WITH docs2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 'row row row data'
      |         WHEN doc_id % 3 = 0 THEN text || ' data table'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |), """.stripMargin +
      graft.ops.LlmOps.bm25BodySqlFor("docs2", QueryTerms)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_bm25_vocab" -> ((s, d) => bm25VocabIncremental(s, d)))

  def oracles: Map[String, String] = Map(
    "cdc_bm25_vocab" -> bm25VocabOracle)
}
