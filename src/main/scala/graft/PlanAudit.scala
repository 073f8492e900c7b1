package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    // Default audit set, or an explicit list of query names as args.
    val audit = if (args.nonEmpty) args.toSeq
    else Seq("agg_q1", "join_broadcast", "join_q3", "join_skew_salted",
        "sort_topk", "filter_predicates", "cdc_merge_customer",
        "llm_sim_topk", "llm_dedup_minhash", "llm_sim_centroids",
        "llm_sim_ivf_multiprobe", "llm_text_rollhash", "sample_hash",
        "llm_curate", "llm_sim_rerank", "llm_decontaminate", "llm_pack",
        "llm_sim_binary", "graph_bfs", "dsq_hour_bands",
        "join_asof_nearest", "agg_heavy_hitters", "win_reach",
        "llm_sim_filtered", "llm_sim_filtered_post", "join_dpp",
        "llm_source_overlap", "dsq_rollup_rank", "llm_dedup_lsh_recall")
    for (q <- audit) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator
        .filter(l => l.contains("Scan") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("Broadcast") || l.contains("TakeOrdered") || l.contains("WholeStageCodegen") ||
          l.contains("Exchange") || l.contains("Aggregate") || l.contains("Expand") ||
          l.contains("Window") || l.contains("Generate") || l.contains("Sort"))
        .take(20).mkString("\n"))
    }
    spark.stop()
  }
}
