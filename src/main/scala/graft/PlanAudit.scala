package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("agg_q1", "join_broadcast", "join_q3", "join_skew_salted",
        "sort_topk", "filter_predicates", "cdc_merge_customer",
        "llm_sim_topk", "llm_dedup_minhash", "llm_sim_centroids",
        "llm_sim_ivf_multiprobe", "llm_text_rollhash", "sample_hash",
        "llm_curate", "llm_sim_rerank", "llm_decontaminate", "llm_pack")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator
        .filter(l => l.contains("Scan") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Broadcast") || l.contains("TakeOrdered") || l.contains("WholeStageCodegen") ||
          l.contains("Exchange") || l.contains("HashAggregate")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
