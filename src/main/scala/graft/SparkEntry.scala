package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a named query here; each query
  * has (where SQL-expressible) a DuckDB oracle over the same fixture
  * tables. Column names are aliased identically on both sides and every
  * query is totally ordered, so the driver's sorted-column hash compare
  * is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's essential computation: CDC change log materialized
    * into current table state (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CdcQueries.mergeCustomer(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * CALLER CONTRACT: some operators `.persist()` frames that several
    * branches of their own plan consume (LSH signatures, shingle sets,
    * CC labels); those blocks stay cached until the session drops them.
    * Harnesses that run many queries in one session must call
    * `spark.catalog.clearCache()` between queries — Bench, Verify and
    * TimeQ all do — or cached blocks accumulate across invocations.
    * (The iterative connected-components pass additionally writes
    * per-round `localCheckpoint` blocks; those are outside the catalog
    * cache and are reclaimed by the ContextCleaner once the round's
    * frame is unreferenced — tiny label frames, bounded by the round
    * cap, no action needed from callers.)
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CdcQueries.queries ++
      graft.queries.MorQueries.queries ++
      graft.queries.SnapshotQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.IvfCdcQueries.queries ++
      graft.queries.MinhashCdcQueries.queries ++
      graft.queries.PqCdcQueries.queries ++
      graft.queries.AggCdcQueries.queries ++
      graft.queries.Bm25CdcQueries.queries ++
      graft.queries.Bm25VocabQueries.queries ++
      graft.queries.RankHybridCdcQueries.queries ++
      graft.queries.PiiCdcQueries.queries ++
      graft.queries.HnswCdcQueries.queries ++
      graft.queries.LinesCdcQueries.queries ++
      graft.queries.JoinCdcQueries.queries ++
      graft.queries.Scd2CdcQueries.queries ++
      graft.queries.TxApplyQueries.queries ++
      graft.queries.TxApplyMultiQueries.queries ++
      graft.queries.OutboxQueries.queries ++
      graft.queries.OccQueries.queries ++
      graft.queries.MaintenanceQueries.queries ++
      graft.queries.CatalogQueries.queries ++
      graft.ops.Relational.queries ++
      graft.ops.Functions.queries ++
      graft.ops.LlmOps.queries ++
      graft.ops.ClusterOps.queries ++
      graft.ops.GraphOps.queries ++
      graft.ops.AnalyticsOps.queries ++
      graft.ops.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CdcQueries.oracles ++
      graft.queries.MorQueries.oracles ++
      graft.queries.SnapshotQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.IvfCdcQueries.oracles ++
      graft.queries.MinhashCdcQueries.oracles ++
      graft.queries.PqCdcQueries.oracles ++
      graft.queries.AggCdcQueries.oracles ++
      graft.queries.Bm25CdcQueries.oracles ++
      graft.queries.Bm25VocabQueries.oracles ++
      graft.queries.RankHybridCdcQueries.oracles ++
      graft.queries.PiiCdcQueries.oracles ++
      graft.queries.HnswCdcQueries.oracles ++
      graft.queries.LinesCdcQueries.oracles ++
      graft.queries.JoinCdcQueries.oracles ++
      graft.queries.Scd2CdcQueries.oracles ++
      graft.queries.TxApplyQueries.oracles ++
      graft.queries.TxApplyMultiQueries.oracles ++
      graft.queries.OutboxQueries.oracles ++
      graft.queries.OccQueries.oracles ++
      graft.queries.MaintenanceQueries.oracles ++
      graft.queries.CatalogQueries.oracles ++
      graft.ops.Relational.oracles ++
      graft.ops.Functions.oracles ++
      graft.ops.LlmOps.oracles ++
      graft.ops.ClusterOps.oracles ++
      graft.ops.GraphOps.oracles ++
      graft.ops.AnalyticsOps.oracles ++
      graft.ops.StreamingOps.oracles
}
