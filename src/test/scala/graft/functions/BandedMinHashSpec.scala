package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd BandedMinHash expression must be a drop-in replacement
  * for the higher-order `aggregate(transform(sset, md5), …, 4×least)`
  * fold it displaced: identical band minima on every fixture document,
  * identical sentinels on the empty set, null elements skipped, and it
  * must actually run inside whole-stage codegen.
  */
class BandedMinHashSpec extends SparkTestBase {

  // The displaced fold, verbatim: each band minimum over an 8-hex-char
  // slice of the per-shingle md5, seeded with a sentinel that sorts
  // after every lowercase-hex slice.
  private def hofMins(sset: org.apache.spark.sql.Column) = {
    val sentinel = lit("zzzzzzzz")
    val m = aggregate(
      transform(sset, s => md5(s)),
      struct(sentinel.as("m0"), sentinel.as("m1"),
        sentinel.as("m2"), sentinel.as("m3")),
      (acc, h) => struct(
        least(acc.getField("m0"), h.substr(1, 8)).as("m0"),
        least(acc.getField("m1"), h.substr(9, 8)).as("m1"),
        least(acc.getField("m2"), h.substr(17, 8)).as("m2"),
        least(acc.getField("m3"), h.substr(25, 8)).as("m3")))
    array(m.getField("m0"), m.getField("m1"),
      m.getField("m2"), m.getField("m3"))
  }

  test("expression matches the HOF fold on every fixture document") {
    val words = split(col("text"), " ")
    val rows = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(words).as("sset"))
      .select(col("doc_id"),
        BandedMinHash.bandedMinhash(col("sset")).as("expr_ms"),
        hofMins(col("sset")).as("hof_ms"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"doc ${r.get(0)}")
    }
  }

  test("empty set yields the fold's sentinels; nulls are skipped; " +
    "multibyte shingles hash like the fold") {
    val cases = spark.sql(
      """SELECT * FROM VALUES
        |  (1, CAST(array() AS array<string>)),
        |  (2, array('a', CAST(NULL AS string), 'b')),
        |  (3, array('émile zola — œuvres', '東京 大阪', 'plain ascii'))
        |AS t(id, sset)""".stripMargin)
    val rows = cases
      .select(col("id"),
        BandedMinHash.bandedMinhash(col("sset")).as("expr_ms"),
        hofMins(col("sset")).as("hof_ms"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"case ${r.get(0)}")
    }
    val empty = rows.find(_.getInt(0) == 1).get.getSeq[String](1)
    assert(empty === Seq.fill(4)("zzzzzzzz"))
  }

  test("banded_minhash resolves from the registry and rejects bad arity") {
    BandedMinHash.register(spark)
    val out = spark.sql(
      "SELECT banded_minhash(array('x'))[0] AS m").collect()
    assert(out.head.getString(0).length === 8)
    val err = intercept[Exception] {
      spark.sql("SELECT banded_minhash(array('x'), array('y'))").collect()
    }
    assert(err.getMessage.contains("banded_minhash"))
  }

  test("expression runs inside whole-stage codegen") {
    val words = split(col("text"), " ")
    val executed = Tables.load(spark, sf, "documents")
      .select(BandedMinHash.bandedMinhash(array_distinct(words)).as("ms"))
      .queryExecution.executedPlan
    val wsc = executed.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"banded_minhash fell out of codegen:\n$executed")
  }
}
