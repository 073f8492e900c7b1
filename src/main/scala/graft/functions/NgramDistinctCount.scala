package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT word n-grams of a word array in one compiled
  * pass — the repetition-quality kernel ([[graft.ops.LlmOps.
  * textRepetition]]).
  *
  * The declarative spelling —
  * `size(array_distinct(transform(sequence(...), i -> concat_ws(...))))`
  * — materializes an index array, a full n-gram string array, then
  * `array_distinct`'s PAIRWISE O(k²) string comparison per document;
  * measured via ScaleCurve it put llm_text_repetition at 5.3 s for
  * sf0.1 where its scan-local siblings run in ~0.5 s. Like
  * [[ShingleSet]] (same sliding window, k=3, whose first-occurrence
  * ORDER the LSH pipeline needs), this expression slides the window
  * and hashes each n-gram into a HashSet in one JIT-compiled loop —
  * but only ever returns the set SIZE, so nothing is materialized per
  * row. Null word slots are skipped inside a window, mirroring
  * `concat_ws`. Stays scan-local and zero-shuffle; whole-stage
  * codegen keeps it inside the scan's loop.
  */
case class NgramDistinctCount(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"ngram_distinct_count expects n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_distinct_count expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ngram_distinct_count"

  override protected def nullSafeEval(v: Any): Any =
    NgramDistinctCount.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramDistinctCount.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramDistinctCount {

  private val space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): Int = {
    val len = words.numElements()
    if (len < n) return 0
    val seen = new java.util.HashSet[UTF8String]
    var i = 0
    while (i <= len - n) {
      if (n == 1) seen.add(word(words, i))
      else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = word(words, i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
      }
      i += 1
    }
    seen.size
  }

  private def word(words: ArrayData, i: Int): UTF8String =
    if (words.isNullAt(i)) null else words.getUTF8String(i)

  def ngramDistinctCount(words: Column, n: Int): Column =
    GraftBridge.column(NgramDistinctCount(GraftBridge.expression(words), n))
}
