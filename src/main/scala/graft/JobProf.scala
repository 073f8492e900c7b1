package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-level profiler for one or more registered queries — the
  * measure-first tool behind OPTIMIZATION_r17.md: runs each named query
  * once (same session/env contract as [[TimeQ]]), and reports where the
  * wall-clock went at job granularity: number of Spark jobs, the sum of
  * job durations, the wall time, and the DRIVER GAP (wall − job time —
  * planning, filesystem metadata, commit bookkeeping, collect overhead).
  * A query whose gap dominates is driver-bound and won't speed up with
  * more cores; one whose job count is huge pays scheduling latency per
  * job. Per-description totals name the expensive phases when queries
  * label their jobs.
  *
  * `sbt "runMain graft.JobProf cdc_join_incremental"`
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warmup
    try Prestage.all(spark, sfDir) catch { case _: Throwable => () }
    spark.catalog.clearCache()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    final case class Acc(var nJobs: Int = 0, var jobNanos: Long = 0L,
                         val byDesc: scala.collection.mutable.Map[String, (Int, Long)] =
                           scala.collection.mutable.Map.empty)
    var acc = Acc()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .filter(_.nonEmpty).map(_.replaceAll("[\n\r]", " "))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val d = System.nanoTime() - t0
          acc.synchronized {
            acc.nJobs += 1
            acc.jobNanos += d
            val key = if (desc.isEmpty) "(unlabeled)" else desc.take(60)
            val (n, t) = acc.byDesc.getOrElse(key, (0, 0L))
            acc.byDesc(key) = (n + 1, t + d)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (q <- args) {
      spark.catalog.clearCache()
      acc = Acc()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // Let straggler listener events drain before reading the tallies.
      Thread.sleep(300)
      val (nJobs, jobSec, byDesc) = acc.synchronized {
        (acc.nJobs, acc.jobNanos / 1e9, acc.byDesc.toSeq)
      }
      println(f"== $q%-26s wall ${wall}%6.2f s  jobs $nJobs%4d  " +
        f"jobTime ${jobSec}%6.2f s  driverGap ${wall - jobSec}%6.2f s")
      byDesc.sortBy(-_._2._2).take(12).foreach { case (d, (n, t)) =>
        println(f"   ${t / 1e9}%6.2f s  n=$n%3d  $d")
      }
    }
    spark.stop()
  }
}
