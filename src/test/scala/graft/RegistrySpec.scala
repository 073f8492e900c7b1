package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the driver's correctness gate walks
  * `SparkEntry.queries` and compares against `oracleSql` by name, and
  * the maps are built by `++` over per-module maps — a duplicate name
  * between modules would silently REPLACE a query and shrink coverage
  * without any failure. These guards make both failure modes loud.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("CdcQueries", queries.CdcQueries.queries, queries.CdcQueries.oracles),
      ("MorQueries", queries.MorQueries.queries, queries.MorQueries.oracles),
      ("SnapshotQueries", queries.SnapshotQueries.queries,
        queries.SnapshotQueries.oracles),
      ("PipelineQueries", queries.PipelineQueries.queries,
        queries.PipelineQueries.oracles),
      ("IvfCdcQueries", queries.IvfCdcQueries.queries,
        queries.IvfCdcQueries.oracles),
      ("PqCdcQueries", queries.PqCdcQueries.queries,
        queries.PqCdcQueries.oracles),
      ("AggCdcQueries", queries.AggCdcQueries.queries,
        queries.AggCdcQueries.oracles),
      ("JoinCdcQueries", queries.JoinCdcQueries.queries,
        queries.JoinCdcQueries.oracles),
      ("Scd2CdcQueries", queries.Scd2CdcQueries.queries,
        queries.Scd2CdcQueries.oracles),
      ("TxApplyQueries", queries.TxApplyQueries.queries,
        queries.TxApplyQueries.oracles),
      ("TxApplyMultiQueries", queries.TxApplyMultiQueries.queries,
        queries.TxApplyMultiQueries.oracles),
      ("OutboxQueries", queries.OutboxQueries.queries,
        queries.OutboxQueries.oracles),
      ("Bm25CdcQueries", queries.Bm25CdcQueries.queries,
        queries.Bm25CdcQueries.oracles),
      ("Bm25VocabQueries", queries.Bm25VocabQueries.queries,
        queries.Bm25VocabQueries.oracles),
      ("RankHybridCdcQueries", queries.RankHybridCdcQueries.queries,
        queries.RankHybridCdcQueries.oracles),
      ("PiiCdcQueries", queries.PiiCdcQueries.queries,
        queries.PiiCdcQueries.oracles),
      ("HnswCdcQueries", queries.HnswCdcQueries.queries,
        queries.HnswCdcQueries.oracles),
      ("LinesCdcQueries", queries.LinesCdcQueries.queries,
        queries.LinesCdcQueries.oracles),
      ("MinhashCdcQueries", queries.MinhashCdcQueries.queries,
        queries.MinhashCdcQueries.oracles),
      ("OccQueries", queries.OccQueries.queries, queries.OccQueries.oracles),
      ("MaintenanceQueries", queries.MaintenanceQueries.queries,
        queries.MaintenanceQueries.oracles),
      ("CatalogQueries", queries.CatalogQueries.queries,
        queries.CatalogQueries.oracles),
      ("Relational", ops.Relational.queries, ops.Relational.oracles),
      ("Functions", ops.Functions.queries, ops.Functions.oracles),
      ("LlmOps", ops.LlmOps.queries, ops.LlmOps.oracles),
      ("ClusterOps", ops.ClusterOps.queries, ops.ClusterOps.oracles),
      ("GraphOps", ops.GraphOps.queries, ops.GraphOps.oracles),
      ("AnalyticsOps", ops.AnalyticsOps.queries, ops.AnalyticsOps.oracles),
      ("StreamingOps", ops.StreamingOps.queries, ops.StreamingOps.oracles))

  test("no query name collides across modules (++ would silently drop one)") {
    val all = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty,
      s"duplicate query names across modules: " +
        dups.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
          .mkString(", "))
    assert(SparkEntry.queries.size === all.length,
      "SparkEntry must surface every module query exactly once")
  }

  test("queries and oracles cover exactly the same names") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      "a query without an oracle gets only the weak rows-only check; " +
        "an oracle without a query checks nothing")
    modules.foreach { case (m, qs, os) =>
      assert(qs.keySet === os.keySet, s"module $m drifted")
    }
  }
}
