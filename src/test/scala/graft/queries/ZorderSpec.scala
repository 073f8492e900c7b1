package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quantifies the claim `layout_zorder` exists for: z-bucket footer
  * stats are tight on BOTH dimensions, while a linear sort is tight
  * only on its leading column — so a predicate on the secondary
  * column prunes z-files and cannot prune linear files.
  */
class ZorderSpec extends SparkTestBase {

  test("z-buckets bound both dims; a partkey-linear layout leaves " +
      "suppkey unprunable") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey")
    val dom = li.agg(
      (max("l_partkey") - min("l_partkey")).cast("double"),
      (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
    val (pkSpan, skSpan) = (dom.getDouble(0), dom.getDouble(1))

    // Mean normalized per-bucket span under the z-order layout.
    val z = MaintenanceQueries.layoutZorder(spark, sf)
      .agg(avg((col("pk_max") - col("pk_min")) / pkSpan).as("pk"),
        avg((col("sk_max") - col("sk_min")) / skSpan).as("sk"))
      .head()
    // A z-bucket is the top-4 interleaved bits of each dim → each dim
    // confined to 1/16 of its domain (plus quantization slack).
    assert(z.getDouble(0) <= 0.15,
      s"z layout: partkey span ${z.getDouble(0)} not tight")
    assert(z.getDouble(1) <= 0.15,
      s"z layout: suppkey span ${z.getDouble(1)} not tight")

    // Same file count (256), linear-sorted by partkey: the rank-range
    // buckets a partkey-ordered writer would cut. Leading column
    // tight, secondary column ~the whole domain in every file.
    val rowsPerBucket = math.ceil(li.count() / 256.0).toLong
    val w = org.apache.spark.sql.expressions.Window.orderBy("l_partkey")
    val linear = li
      .withColumn("bucket",
        ((row_number().over(w) - 1) / lit(rowsPerBucket)).cast("long"))
      .groupBy("bucket")
      .agg(min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))
      .agg(avg((col("sk_max") - col("sk_min")) / skSpan))
      .head().getDouble(0)
    assert(linear >= 0.9,
      s"expected linear layout to leave suppkey unpruned, got $linear")
  }
}
