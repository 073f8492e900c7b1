package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression with whole-stage codegen: byte-level
  * Hamming distance between two strings (differing bytes + length
  * difference). Purpose-built for SimHash fingerprints (ASCII bit
  * strings), where it is the inner-loop comparator of the near-dup
  * pair search — the extension-hierarchy step the engine takes when
  * built-ins can't express an operation efficiently: a codegen'd
  * `Expression` stays inside WholeStageCodegen (no row-at-a-time
  * serialization), unlike a Scala UDF.
  *
  * The built-in composition (`zip_with(split(a,''), split(b,''), ...)`)
  * materializes two char arrays per comparison; this expression is a
  * single fused byte loop.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String]
    val b = r.asInstanceOf[UTF8String]
    val n = math.min(a.numBytes, b.numBytes)
    var d = math.abs(a.numBytes - b.numBytes)
    var i = 0
    while (i < n) {
      if (a.getByte(i) != b.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |${ev.value} = java.lang.Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Engine function surface for custom expressions: direct Column
  * constructors for the DataFrame API plus session-registry
  * registration so `expr("hamming(a, b)")` / SQL text resolve too
  * (registration into an EXISTING session's registry — no
  * SparkSessionExtensions needed, which matters because the driver
  * owns session construction).
  */
object GraftFunctions {

  def hamming(a: Column, b: Column): Column =
    GraftBridge.column(HammingDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (children: Seq[Expression]) =>
        HammingDistance(children.head, children(1)))
  }
}
