package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runs each named query cold (cache cleared
  * between runs) with the same noop-sink executor Bench uses, at sf0.1.
  * Repeat a name to measure steady-state vs first-run JIT effects:
  * `sbt "runMain graft.TimeQ llm_dedup_minhash llm_dedup_minhash"`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Tables.sessionConfigs.foldLeft(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warmup
    for (q <- args) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$q%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
