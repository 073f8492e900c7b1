package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd JaccardSim expression must be a drop-in replacement
  * for the `size(array_intersect)/size(array_union)` twin it displaced:
  * bit-identical doubles on every fixture shingle-set pair, matching
  * set semantics on duplicates/disjoint/empty inputs, and it must run
  * inside whole-stage codegen.
  */
class JaccardSimSpec extends SparkTestBase {

  private def hofJac(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  test("expression matches the intersect/union twin on fixture pairs") {
    val words = split(col("text"), " ")
    val ss = Tables.load(spark, sf, "documents")
      .filter(size(words) >= 3)
      .select(col("doc_id"), ShingleSet.shingleSet(words).as("sset"))
    // All ordered adjacent pairs: enough to exercise real overlap
    // distributions without an all-pairs blow-up at spec scale.
    val a = ss.select(col("doc_id").as("d1"), col("sset").as("sa"))
    val b = ss.select((col("doc_id") - 1).as("d1"), col("sset").as("sb"))
    val rows = a.join(b, Seq("d1"))
      .select(JaccardSim.jaccardSim(col("sa"), col("sb")).as("expr_j"),
        hofJac(col("sa"), col("sb")).as("hof_j"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("set semantics: duplicates collapse, disjoint is 0, equal is 1, " +
    "empty/empty is the twin's NaN") {
    val cases = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a','a','b'), array('b','b','c')),
        |  (array('x','y'), array('p','q')),
        |  (array('s','t'), array('t','s','t')),
        |  (array('a', CAST(NULL AS string)), array(CAST(NULL AS string)))
        |AS t(a, b)""".stripMargin)
    val rows = cases
      .select(JaccardSim.jaccardSim(col("a"), col("b")).as("expr_j"),
        hofJac(col("a"), col("b")).as("hof_j"))
      .collect()
    rows.foreach { r =>
      val (e, h) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(e) ===
        java.lang.Double.doubleToLongBits(h), s"$e != $h")
    }
    assert(rows.map(_.getDouble(0)).take(3).toSeq === Seq(1.0 / 3, 0.0, 1.0))
    // Empty/empty: the ANSI twin throws on its 0/0 division; the
    // expression is total and yields the IEEE NaN instead.
    val empty = spark.sql(
      "SELECT CAST(array() AS array<string>) AS a")
      .select(JaccardSim.jaccardSim(col("a"), col("a")).as("j"))
      .collect()
    assert(empty.head.getDouble(0).isNaN)
  }

  test("jaccard_sim resolves from the registry and rejects bad arity") {
    JaccardSim.register(spark)
    ShingleSet.register(spark) // shared session: make the test order-proof
    val out = spark.sql(
      "SELECT jaccard_sim(shingle_set(array('a','b','c','d')), " +
        "shingle_set(array('a','b','c','d'))) AS j").collect()
    assert(out.head.getDouble(0) === 1.0)
    val err = intercept[Exception] {
      spark.sql("SELECT jaccard_sim(array('x'))").collect()
    }
    assert(err.getMessage.contains("jaccard_sim"))
  }

  test("expression runs inside whole-stage codegen") {
    val words = split(col("text"), " ")
    val ss = Tables.load(spark, sf, "documents")
      .select(ShingleSet.shingleSet(words).as("s"))
    val executed = ss
      .select(JaccardSim.jaccardSim(col("s"), col("s")).as("j"))
      .queryExecution.executedPlan
    val wsc = executed.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"jaccard_sim fell out of codegen:\n$executed")
  }
}
