package graft.cdc

import graft.SparkTestBase
import graft.queries.CdcQueries
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** The sql_merge fixture-invariant guard (VERDICT r5 "what's wrong" #1):
  * the query's oracle equality holds only because the change log's
  * snapshot wave restores every key the partial target drops. The guard
  * CTE must (a) stay silent when the invariant holds and (b) fail with a
  * "fixture invariant violated" message — NOT a silent hash mismatch —
  * when a regenerated fixture lacks the full snapshot wave.
  */
class SqlMergeGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def register(fullKeys: Seq[Long], droppedKeys: Set[Long],
      snapshotKeys: Seq[Long]): Unit = {
    val full = fullKeys.toDF("c_custkey")
      .select($"c_custkey", lit("n").as("c_name"), lit(1L).as("c_nationkey"),
        lit(10.0).as("c_acctbal"), lit("SEG").as("c_mktsegment"))
    full.createOrReplaceTempView("guard_spec_full")
    full.filter(!$"c_custkey".isin(droppedKeys.toSeq: _*))
      .createOrReplaceTempView("guard_spec_target")
    snapshotKeys.toDF("c_custkey")
      .select($"c_custkey", lit("n").as("c_name"), lit(1L).as("c_nationkey"),
        lit(10.0).as("c_acctbal"), lit("SEG").as("c_mktsegment"),
        lit("r").as("_op"), lit(1000L).as("_ts"), lit(0L).as("_seq"))
      .createOrReplaceTempView("guard_spec_source")
  }

  private def run() = spark.sql(CdcQueries.sqlMergeStatement(
    "guard_spec_full", "guard_spec_target", "guard_spec_source")).collect()

  test("guard passes when the snapshot wave covers every dropped key") {
    register(fullKeys = 1L to 20L, droppedKeys = Set(11L),
      snapshotKeys = 1L to 20L)
    assert(run().map(_.getLong(0)).toSeq == (1L to 20L))
  }

  test("guard fails loudly when a dropped key lacks snapshot coverage") {
    // Key 11 is dropped from the target AND absent from the snapshot
    // wave — the exact failure mode of a fixture regenerated without a
    // full op='r' pass.
    register(fullKeys = 1L to 20L, droppedKeys = Set(11L),
      snapshotKeys = (1L to 20L).filterNot(_ == 11L))
    val e = intercept[Exception](run())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("fixture invariant violated")),
      s"expected a loud fixture-invariant error, got: ${e.getMessage}")
  }

  test("the real fixture satisfies the invariant end-to-end") {
    val rows = CdcQueries.sqlMerge(spark, sf)
    assert(rows.count() > 0)
  }
}
