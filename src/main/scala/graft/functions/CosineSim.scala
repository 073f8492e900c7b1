package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression with whole-stage codegen: cosine
  * similarity between two array<double> embedding columns in ONE fused
  * loop (dot product and both norms accumulated together).
  *
  * This is the hot inner comparator of every similarity operator
  * (top-k, threshold join, IVF probe, embedding dedup). The built-in
  * composition — `aggregate(zip_with(a,b,_*_), ...)` for the dot plus
  * two more folds for the norms — is a higher-order-function tree that
  * Catalyst evaluates INTERPRETED (lambda dispatch per element, three
  * passes, an intermediate product array); this expression is a single
  * codegen'd pass with three scalar accumulators.
  *
  * Numerics are IDENTICAL to the HOF formula by construction: each
  * accumulator performs the same left-to-right IEEE addition sequence
  * the sequential folds performed, and the final combine is the same
  * `dab / (sqrt(daa) * sqrt(dbb))` — so oracle comparisons (DuckDB
  * list_dot_product, same element order) agree bit-for-bit, as
  * CosineSimSpec asserts against the HOF twin.
  *
  * Edge contract: mismatched lengths FAIL (an embedding-dimension
  * mismatch is a data bug — silent truncation would hide it; the HOF
  * twin silently yields NULL instead); a null element yields NULL (the
  * HOF's propagation); a zero-norm vector yields NaN — the honest IEEE
  * 0/0, identical in the HOF twin and the DuckDB oracle.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Null elements yield NULL even when the child arrays themselves are
  // non-nullable, so this expression is always nullable.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw CosineSim.lengthMismatch(n, b.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.CosineSim.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dab /
         |    (java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Shared by the interpreted and generated paths (and by the
    * generated Java, which is why it is public). */
  def lengthMismatch(l: Int, r: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"cosine_sim: embedding dimensions differ ($l vs $r) — " +
        "refusing to silently truncate")

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim expects 2 arguments, got ${children.length}")
        CosineSim(children.head, children(1))
      })
  }
}
