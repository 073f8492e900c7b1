package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a word array in ONE compiled pass.
  *
  * The declarative spelling —
  * `array_distinct(filter(transform(sequence(0, size-3),
  * i -> concat_ws(' ', w[i+1], w[i+2], w[i+3])), notNull))` — is a
  * four-deep higher-order-function tree Catalyst evaluates INTERPRETED:
  * it materializes an index array, dispatches a lambda per shingle,
  * allocates through generic concat codegen, then rebuilds a hash set
  * in a second pass. Profiled at sf0.1 that projection alone cost
  * ~4.2 s — the true bottleneck of the LSH dedup pair (the signature
  * fold it feeds was only ever the second-order term). This expression
  * does the same work as one JIT-compiled loop: slide a 3-word window,
  * concat via `UTF8String.concatWs` (no codepoint copies beyond the
  * output buffer), and dedupe through a LinkedHashSet so
  * first-occurrence order — and therefore bit-identity with the
  * `array_distinct` twin — is preserved (ShingleSetSpec asserts it).
  *
  * Scale story is unchanged: shingle sets remain a scan-local,
  * zero-shuffle projection; this only swaps the interpreter for
  * compiled code on the hot path.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(v: Any): Any =
    ShingleSet.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {

  private val space = UTF8String.fromString(" ")

  /** Distinct 3-gram shingles in first-occurrence order. Null word
    * slots are skipped inside a window, mirroring `concat_ws`. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= n - 3) {
      out.add(UTF8String.concatWs(space,
        word(words, i), word(words, i + 1), word(words, i + 2)))
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef](Array.empty[AnyRef]))
  }

  private def word(words: ArrayData, i: Int): UTF8String =
    if (words.isNullAt(i)) null else words.getUTF8String(i)

  def shingleSet(words: Column): Column =
    GraftBridge.column(ShingleSet(GraftBridge.expression(words)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"shingle_set expects 1 argument, got ${children.length}")
        ShingleSet(children.head)
      })
  }
}
