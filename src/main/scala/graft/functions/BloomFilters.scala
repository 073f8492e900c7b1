package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Column wrappers over Spark's internal bloom-filter expressions (the
  * machinery behind AQE's `InjectRuntimeFilter`), exposed so a query
  * can hand-materialize a runtime filter: build the filter on the
  * selective side, embed it as a literal, and pre-filter the fact scan
  * before the shuffle — exactly what the optimizer's injected bloom
  * subquery does, but available where the rule doesn't fire (e.g.
  * across separately-planned actions). Both expressions are codegen'd;
  * the probe side stays inside whole-stage codegen.
  */
object BloomFilters {

  /** Aggregate a bloom filter over `key` (hash to LONG first — pair
    * with the same hash on the probe side). Returns the serialized
    * filter as one binary value.
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(GraftBridge.expression(key),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a collected bloom filter: true if `key` might be in the
    * build set (false positives possible, false negatives impossible —
    * callers must keep the exact join after the pre-filter).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(Literal(bloom),
      GraftBridge.expression(key)))

  /** Probe a PER-ROW serialized filter — the distributed sidecar
    * consult [[BloomProbe]]: Spark's own `BloomFilterMightContain`
    * requires a constant-foldable filter side (it exists to embed ONE
    * runtime filter), so consulting a persisted sidecar TABLE (one
    * filter per data file) needs this per-row variant. Used on
    * metadata-sized frames (one row per file), never on data rows.
    */
  def probe(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomProbe(GraftBridge.expression(bloom),
      GraftBridge.expression(key)))

  /** Row-level probe body, shared by interpreted eval and codegen. */
  def probeSerialized(bytes: Array[Byte], key: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(key)
}

/** Codegen'd per-row bloom probe: `probe(bf binary, key long)` →
  * might-contain boolean. Each row deserializes its own filter — the
  * right trade on a sidecar frame whose cardinality is the FILE count
  * (a consult touches every row exactly once; caching deserialized
  * filters would only matter for repeated probes, which callers batch
  * into one pass anyway).
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BloomFilters.probeSerialized(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bf, k) =>
      s"${ev.value} = graft.functions.BloomFilters.probeSerialized($bf, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
