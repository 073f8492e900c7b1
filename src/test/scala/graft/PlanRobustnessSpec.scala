package graft

/** Differential planner-robustness guard: results must be INVARIANT to
  * physical strategy — broadcast vs shuffle joins, partition counts —
  * because at 1000 executors the planner will make different choices
  * than at local[4]. Representative queries run twice, once under the
  * default config and once with broadcasting disabled and an awkward
  * prime shuffle partition count, and must collect identical rows
  * (every registered query is totally ordered, so row-list equality is
  * well-defined). A failure here means a query's RESULT leaked a
  * dependence on join strategy or partitioning — the bug class that
  * passes every fixed-config oracle run and detonates on the cluster.
  */
class PlanRobustnessSpec extends SparkTestBase {

  private val probes = Seq(
    "llm_dedup_minhash", // LSH banding + semi joins
    "join_q3",           // multi-way broadcast-heavy join
    "cdc_merge_customer", // the flagship merge
    "agg_heavy_hitters", // sketch merge order
    "graph_bfs",         // iterative broadcast-hinted joins
    "llm_sim_hnsw",      // layered beam walk: joins + window cuts
    "llm_sim_filtered",  // strategy census + pushdown path
    "maintenance_wap_branch", // stage/audit/publish over the store
    "maintenance_refs_diff",  // full-outer state diff, bucket-pruned
    "llm_mix_importance_topk", // histogram threshold + boundary window
    "layout_bloom",           // persisted-sidecar consult + pruned scan
    "cdc_merge_mor_position", // (file,pos) anti joins + compaction fold
    "profile_t_closeness",    // per-class TVD: join order + broadcast q
    "llm_quality_repetition", // scan-local bigrams + 3-level rollup
    "cdc_pipeline_wap",       // observe-audited staged commits
    "llm_dedup_lines",        // digest census + broadcast anti-join rewrite
    "cdc_bm25_vocab",         // three-table maintenance + df-pivot serve
    "llm_rank_hybrid_ann")    // IVF prune + two-leg RRF fusion

  test("results are invariant to broadcast strategy and partition count") {
    for (q <- probes) {
      val default = SparkEntry.queries(q)(spark, sf).collect().toSeq
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        spark.catalog.clearCache()
        val adversarial = SparkEntry.queries(q)(spark, sf).collect().toSeq
        assert(adversarial === default,
          s"$q result depends on physical strategy")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.catalog.clearCache()
      }
    }
  }
}
