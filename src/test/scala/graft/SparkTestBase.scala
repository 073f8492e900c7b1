package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one JVM-wide session; Spark reuses
  * the active session across suites in the forked test JVM).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.sessionConfigs
    .foldLeft(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
