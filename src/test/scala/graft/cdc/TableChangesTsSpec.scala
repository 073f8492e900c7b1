package graft.cdc

import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** CDF between timestamps ([[StateStore.diffTimes]]): a window whose
  * upper bound sits BETWEEN the update wave and the delete wave must
  * surface the updates only — zero deletes — and an empty window
  * (both bounds resolving to the same version) must be an empty feed.
  */
class TableChangesTsSpec extends SparkTestBase {

  test("between-markers window sees only the waves inside it") {
    val wh = graft.Scratch.dir("graft-tcts-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.tcts_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier")
    def wave(df: org.apache.spark.sql.DataFrame, ts: Long,
             deleted: Boolean): Unit = {
      MergeCommit.mergeBatchMeta(store, target, df
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
        .withColumn(StateStore.DeletedCol, lit(deleted))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    wave(sup, 1000L, deleted = false)                                // v0
    Thread.sleep(5); val t1 = System.currentTimeMillis(); Thread.sleep(5)
    wave(sup.filter(col("s_suppkey") % 3 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + 100.0), 2000L,
      deleted = false)                                               // v1
    Thread.sleep(5); val t2 = System.currentTimeMillis(); Thread.sleep(5)
    wave(sup.filter(col("s_suppkey") % 7 === 0), 3000L,
      deleted = true)                                                // v2

    val mid = store.diffTimes(spark, target, t1, t2, pk)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUpd = sup.filter(col("s_suppkey") % 3 === 0).count()
    assert(mid == Map("update" -> nUpd),
      s"t1..t2 must be exactly the update wave, got $mid")

    assert(store.diffTimes(spark, target, t1, t1, pk).count() == 0L,
      "a zero-width window is an empty feed")
  }
}
