package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd CosineSim expression must be a drop-in replacement for
  * the higher-order-function formula it displaced: bit-identical
  * doubles (same IEEE addition order), SQL-registry resolution, and it
  * must actually run inside whole-stage codegen.
  */
class CosineSimSpec extends SparkTestBase {

  private def vecD(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  test("expression matches the HOF cosine bit-for-bit on all fixture pairs") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("v").as("p"))
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, z) => acc + z)
    val hof = dot(col("v"), col("p")) /
      (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("p"), col("p"))))
    val rows = emb.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        CosineSim.cosineSim(col("v"), col("p")).as("expr_cos"),
        hof.as("hof_cos"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("cosine_sim resolves from the session function registry in SQL text") {
    CosineSim.register(spark)
    val out = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()
    assert(out.head.getDouble(0) === 1.0)
  }

  test("edge contract: length mismatch fails, null element yields NULL, " +
    "zero norm yields NaN, registry rejects bad arity") {
    CosineSim.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d))").collect()
    }
    assert(err.getMessage.contains("dimensions differ") ||
      Option(err.getCause).exists(_.getMessage.contains("dimensions differ")))
    val nullElem = spark.sql(
      "SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), " +
        "array(1.0d, 2.0d)) AS c").collect()
    assert(nullElem.head.isNullAt(0))
    val zeroNorm = spark.sql(
      "SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c")
      .collect()
    assert(zeroNorm.head.getDouble(0).isNaN)
    val arity = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d))").collect()
    }
    assert(arity.getMessage.contains("cosine_sim"))
  }

  test("expression runs inside whole-stage codegen") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(vecD(col("embedding")).as("v"))
    val executed = emb.select(CosineSim.cosineSim(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan
    val wsc = executed.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"cosine_sim fell out of codegen:\n$executed")
  }
}
