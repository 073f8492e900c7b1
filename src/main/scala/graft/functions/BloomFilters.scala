package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
}
