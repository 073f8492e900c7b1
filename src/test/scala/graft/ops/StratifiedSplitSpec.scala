package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed stratified-split rank computation (range shards +
  * broadcast offsets + SQL-NTILE arithmetic) must reproduce the
  * single-window `ntile` PER DOCUMENT, and deliver exact-to-the-row
  * proportions per stratum.
  */
class StratifiedSplitSpec extends SparkTestBase {

  test("distributed tiles equal single-window ntile per document") {
    val dist = LlmOps.stratifiedTiles(spark, sf)
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val single = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("ref_tile", ntile(10).over(w))
    val diverged = dist.join(single, Seq("doc_id", "lang"))
      .filter(col("tile") =!= col("ref_tile"))
      .count()
    assert(diverged === 0,
      "sharded rank computation diverged from engine ntile")
    assert(dist.count() === single.count())
  }

  test("per-stratum tile sizes are exact (differ by at most one row)") {
    val sizes = LlmOps.stratifiedTiles(spark, sf)
      .groupBy("lang", "tile").count()
      .groupBy("lang")
      .agg(min("count").as("lo"), max("count").as("hi"),
        count(lit(1)).as("n_tiles"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getLong(3) === 10L, s"stratum ${r.getString(0)} missing tiles")
      assert(r.getLong(2) - r.getLong(1) <= 1L,
        s"stratum ${r.getString(0)} tile sizes not exact: " +
          s"${r.getLong(1)}..${r.getLong(2)}")
    }
  }
}
