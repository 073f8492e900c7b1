package graft

/** Ad-hoc single-query timer: runs each named query cold (cache cleared
  * between runs) with the same noop-sink executor, session builder, and
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS environment as Bench, so its
  * numbers line up with BENCH_r{N}.json. Repeat a name to separate
  * first-run JIT effects from steady state:
  * `sbt "runMain graft.TimeQ llm_dedup_minhash llm_dedup_minhash"`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warmup
    for (q <- args) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
