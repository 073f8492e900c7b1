package graft

/** Dump `.explain("formatted")` for named queries to stdout — the
  * plans/r17 evidence generator. For drain-backed queries the returned
  * frame is a checkpoint/store read, so the formatted plan documents
  * the serve side only; drain-internal claims are evidenced by the
  * JobProf phase numbers committed beside the plans.
  */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      println(s"=====BEGIN $q")
      println(SparkEntry.queries(q)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
      println(s"=====END $q")
    }
    spark.stop()
  }
}
