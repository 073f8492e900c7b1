package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Chunked-snapshot contracts: the merged state must be CHUNK-INVARIANT
  * (equal to the monolithic-snapshot merge of the same live waves), and
  * the chunk images must genuinely differ by read time — otherwise the
  * test would pass without exercising the DBLog dedup rule at all.
  */
class ChunkedSnapshotSpec extends SparkTestBase {

  test("chunked-snapshot merge equals the monolithic merge") {
    val chunked = CdcQueries.snapshotChunked(spark, sf)
      .drop("chunk").collect().toSeq
    val monolithic = CdcQueries.mergeCustomer(spark, sf).collect().toSeq
    assert(chunked.nonEmpty && chunked === monolithic,
      "convergence must not depend on snapshot chunking")
  }

  test("early and late chunk images really differ: the live +200 wave " +
      "is absent from pre-wave chunks and present in post-wave chunks") {
    val base = Tables.load(spark, sf, "customer")
    val log = CdcQueries.chunkedLog(base)
      .filter(col("op") === "r")
      .select(col("after.c_custkey").as("pk"),
        col("after.c_acctbal").as("bal"), col("ts_ms"))
      .filter(col("pk") % 5 === 0 && col("pk") % 3 =!= 0)
    val byBase = base.select(col("c_custkey").as("pk"),
      col("c_acctbal").as("base_bal"))
    val joined = log.join(byBase, "pk")
      .select(col("ts_ms"), (col("bal") - col("base_bal")).as("delta"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1)))
    val early = joined.filter(_._1 < 3000L)
    val late = joined.filter(_._1 > 3000L)
    assert(early.nonEmpty && early.forall(_._2 == 0L),
      "chunks read before the +200 wave must carry the base image")
    assert(late.nonEmpty && late.forall(_._2 == 200L),
      "chunks read after the +200 wave must carry the updated image")
  }
}
