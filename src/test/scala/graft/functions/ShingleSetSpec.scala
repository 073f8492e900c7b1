package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd ShingleSet expression must be a drop-in replacement
  * for the higher-order sequence/transform/concat_ws/array_distinct
  * pipeline it displaced: identical shingle arrays (same elements, same
  * first-occurrence order) on every fixture document, matching window
  * semantics on short/degenerate inputs, and it must actually run
  * inside whole-stage codegen.
  */
class ShingleSetSpec extends SparkTestBase {

  // The displaced declarative pipeline, verbatim.
  private def hofShingles(words: org.apache.spark.sql.Column) =
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(words) - 3, lit(-1))),
        i => concat_ws(" ",
          element_at(words, i + 1), element_at(words, i + 2),
          element_at(words, i + 3))),
      s => s.isNotNull))

  test("expression matches the HOF pipeline on every fixture document") {
    val words = split(col("text"), " ")
    val rows = Tables.load(spark, sf, "documents")
      .filter(size(words) >= 3)
      .select(col("doc_id"),
        ShingleSet.shingleSet(words).as("expr_ss"),
        hofShingles(words).as("hof_ss"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.get(0)}")
    }
  }

  test("short, repeated, and multibyte word arrays match the HOF twin") {
    val cases = spark.sql(
      """SELECT * FROM VALUES
        |  (1, array('a', 'b', 'c', 'a', 'b', 'c', 'a', 'b')),
        |  (2, array('x', 'y', 'z')),
        |  (3, array('only', 'two')),
        |  (4, CAST(array() AS array<string>)),
        |  (5, array('東京', 'œuvres', 'émile', '東京', 'œuvres', 'émile'))
        |AS t(id, ws)""".stripMargin)
    // The production path filters size(ws) >= 3 BEFORE either spelling
    // runs (the HOF twin throws under ANSI element_at below the window
    // size), so the twin comparison only applies to filtered rows; the
    // expression's own contract below the window is an empty set.
    val twins = cases.filter(size(col("ws")) >= 3)
      .select(col("id"),
        ShingleSet.shingleSet(col("ws")).as("expr_ss"),
        hofShingles(col("ws")).as("hof_ss"))
      .collect()
    assert(twins.length === 3)
    twins.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"case ${r.get(0)}")
    }
    val shorts = cases.filter(size(col("ws")) < 3)
      .select(col("id"), ShingleSet.shingleSet(col("ws")).as("expr_ss"))
      .collect()
    assert(shorts.length === 2)
    shorts.foreach { r =>
      assert(r.getSeq[String](1).isEmpty, s"case ${r.get(0)}")
    }
  }

  test("shingle_set resolves from the registry and rejects bad arity") {
    ShingleSet.register(spark)
    val out = spark.sql(
      "SELECT shingle_set(array('a','b','c','d')) AS s").collect()
    assert(out.head.getSeq[String](0) === Seq("a b c", "b c d"))
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_set(array('x'), 3)").collect()
    }
    assert(err.getMessage.contains("shingle_set"))
  }

  test("expression runs inside whole-stage codegen") {
    val words = split(col("text"), " ")
    val executed = Tables.load(spark, sf, "documents")
      .select(ShingleSet.shingleSet(words).as("ss"))
      .queryExecution.executedPlan
    val wsc = executed.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"shingle_set fell out of codegen:\n$executed")
  }
}
