package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set Jaccard similarity |a ∩ b| / |a ∪ b| of two string arrays in
  * ONE compiled pass.
  *
  * The declarative spelling —
  * `size(array_intersect(a,b)) / size(array_union(a,b))` — walks both
  * arrays twice through expressions whose string case is INTERPRETED
  * (Spark's ArrayIntersect/ArrayUnion only generate code for primitive
  * element types) and materializes two intermediate arrays that are
  * immediately reduced to their sizes. This expression builds one hash
  * set per side and counts — no intermediate arrays, no second pass —
  * and stays inside whole-stage codegen in the exact-verification
  * stage of the LSH dedup pipeline, where it runs once per candidate
  * pair.
  *
  * Semantics match the displaced twin exactly (JaccardSimSpec asserts
  * it): duplicates collapse (set semantics), so pre-deduped inputs like
  * [[ShingleSet]] output cost nothing extra; two empty sets yield the
  * IEEE 0/0 = NaN (deliberately total — the declarative twin THROWS
  * there under ANSI division); a null ELEMENT is one set member equal
  * to itself —
  * exactly how array_intersect/array_union treat NULL; a null ARRAY
  * yields NULL.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    val nA = a.numElements()
    while (i < nA) { setA.add(elem(a, i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    var j = 0
    val nB = b.numElements()
    while (j < nB) {
      val e = elem(b, j)
      if (setB.add(e) && setA.contains(e)) inter += 1
      j += 1
    }
    val union = setA.size + setB.size - inter
    inter.toDouble / union
  }

  // HashSet accepts null, matching the set ops' NULL-equals-NULL.
  private def elem(arr: ArrayData, i: Int): UTF8String =
    if (arr.isNullAt(i)) null else arr.getUTF8String(i)

  def jaccardSim(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"jaccard_sim expects 2 arguments, got ${children.length}")
        JaccardSim(children.head, children(1))
      })
  }
}
