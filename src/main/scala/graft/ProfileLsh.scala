package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for the LSH dedup pair: times the
  * shingle-set projection, the signature fold, and the full queries
  * independently (noop sink, cold cache) so regressions can be
  * attributed to a stage instead of guessed.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warmup

    val words = split(col("text"), " ")
    def docs = Tables.load(spark, sfDir, "documents")
    def ssets: DataFrame = docs.filter(size(words) >= 3)
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingleSet(words).as("sset"))

    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (_ <- 1 to (if (args.isEmpty) 2 else args.head.toInt)) {
      time("scan_only")(docs.select(col("doc_id"), col("text")))
      time("shingle_sets")(ssets)
      time("sigs_expr")(ssets.select(col("doc_id"),
        graft.functions.BandedMinHash.bandedMinhash(col("sset")).as("ms")))
      time("sigs_exploded")(ssets
        .select(col("doc_id"),
          graft.functions.BandedMinHash.bandedMinhash(col("sset")).as("ms"))
        .select(col("doc_id"), posexplode(col("ms")).as(Seq("band", "mh"))))
      time("full_minhash")(SparkEntry.queries("llm_dedup_minhash")(spark, sfDir))
      time("full_jaccard")(SparkEntry.queries("llm_dedup_jaccard")(spark, sfDir))
    }
    spark.stop()
  }
}
