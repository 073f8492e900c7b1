package graft.functions

import graft.{SparkTestBase, Tables}
import graft.functions.NgramDistinctCount.ngramDistinctCount
import org.apache.spark.sql.functions._

/** The compiled distinct-n-gram counter must agree with the
  * declarative `size(array_distinct(...))` spelling it replaces —
  * over the whole fixture corpus and on the edge shapes (short
  * arrays, nulls inside windows).
  */
class NgramDistinctCountSpec extends SparkTestBase {

  private def declarativeBigrams = {
    val w = split(col("text"), " ")
    when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", slice(w, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
  }

  test("matches the declarative twin on every fixture document") {
    val w = split(col("text"), " ")
    val diverged = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        ngramDistinctCount(w, 1).as("u1"),
        size(array_distinct(w)).as("d1"),
        ngramDistinctCount(w, 2).as("u2"),
        size(array_distinct(declarativeBigrams)).as("d2"))
      .filter(col("u1") =!= col("d1") || col("u2") =!= col("d2"))
      .count()
    assert(diverged === 0)
  }

  test("edge shapes: short arrays, repeats, nulls inside windows") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a')),
        |  (array('a','a','a')),
        |  (array('a','b','a','b')),
        |  (array(cast(null as string),'x',null)),
        |  (array())
        |AS t(w)""".stripMargin)
      .select(ngramDistinctCount(col("w"), 1).as("u1"),
        ngramDistinctCount(col("w"), 2).as("u2"),
        ngramDistinctCount(col("w"), 5).as("u5"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(df(0) === ((1, 0, 0)), "single word: one unigram, no bigram")
    assert(df(1) === ((1, 1, 0)), "'a a a': bigram 'a a' counted once")
    assert(df(2) === ((2, 2, 0)), "'a b a b': bigrams 'a b' and 'b a'")
    // null slots skipped inside a window like concat_ws: windows
    // (null,x) and (x,null) concat to 'x' — one distinct bigram; the
    // unigram set is {null, x}.
    assert(df(3) === ((2, 1, 0)), "null handling must mirror concat_ws")
    assert(df(4) === ((0, 0, 0)), "empty array")
  }
}
