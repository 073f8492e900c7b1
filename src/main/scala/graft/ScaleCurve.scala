package graft

/** Scaling-curve harness (VERDICT r5 #6): times the headline dedup /
  * curation queries at sf0.001 / sf0.01 / sf0.1 in ONE session (same
  * builder, noop sink, and cache discipline as Bench) and fits the
  * per-segment scaling exponent e in t ∝ sf^e, making the "scales
  * near-linearly" claims falsifiable instead of argued from plan shape.
  * Median of 3 cold repeats per (query, sf); the 10x segment
  * sf0.01→sf0.1 is the meaningful one — below that, fixed per-query
  * overhead (job scheduling, codegen, state setup) dominates real work.
  * Results land in README's scaling table.
  *
  * Usage: `sbt "runMain graft.ScaleCurve [query ...]"` (defaults to the
  * LSH pair + curate + components).
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq
    else Seq("llm_dedup_minhash", "llm_dedup_jaccard", "llm_curate",
      "llm_dedup_components")
    val sfs = Seq("/root/testdata/sf0.001" -> 0.001,
      "/root/testdata/sf0.01" -> 0.01, "/root/testdata/sf0.1" -> 0.1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warmup
    val times = for (q <- queries) yield q -> (for ((dir, sf) <- sfs) yield {
      val samples = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      sf -> samples(1) // median of 3
    })
    println(f"${"query"}%-24s sf0.001  sf0.01   sf0.1    e(0.01->0.1)")
    for ((q, ts) <- times) {
      val m = ts.toMap
      val e = math.log(m(0.1) / m(0.01)) / math.log(10.0)
      println(f"$q%-24s ${m(0.001)}%7.2f ${m(0.01)}%7.2f ${m(0.1)}%7.2f  $e%7.2f")
    }
    spark.stop()
  }
}
