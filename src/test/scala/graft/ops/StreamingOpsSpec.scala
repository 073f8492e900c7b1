package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark late-drop semantics under CONTROLLED micro-batches
  * (MemoryStream): this is the part of the streaming surface whose
  * emission timing depends on batch slicing, so it's asserted here
  * instead of through the (slicing-independent) oracle queries in
  * StreamingOps.
  */
class StreamingOpsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late events from closed windows (append mode)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // Batch 1: two rows in [12:00,13:00) plus a 15:00 row that will
      // advance the watermark to 14:00 after the batch.
      ms.addData((ts("2024-01-01 12:00:00"), "a"),
        (ts("2024-01-01 12:10:00"), "b"),
        (ts("2024-01-01 15:00:00"), "c"))
      q.processAllAvailable()
      // Batch 2: a LATE row for the now-closed 12:00 window (12:30 <
      // watermark 14:00) — must be dropped, and the 12:00 window is
      // emitted with the pre-late count.
      ms.addData((ts("2024-01-01 12:30:00"), "late"))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .select(col("window.start").cast("string").as("s"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows.get("2024-01-01 12:00:00") == Some(2L),
        s"12:00 window must close with 2 rows (late row dropped): $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across nearby batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val deduped = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("k"))
      .select("k")
    val q = deduped.writeStream.format("memory").queryName("ddw_test")
      .outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 12:00:00"), "a"),
        (ts("2024-01-01 12:05:00"), "a"))
      q.processAllAvailable()
      // Same key again within the watermark window: suppressed.
      ms.addData((ts("2024-01-01 12:10:00"), "a"),
        (ts("2024-01-01 12:10:00"), "b"))
      q.processAllAvailable()
      val ks = spark.table("ddw_test").collect().map(_.getString(0)).toSeq
      assert(ks.count(_ == "a") == 1 && ks.count(_ == "b") == 1,
        s"expected one a and one b, got $ks")
    } finally q.stop()
  }

  test("late event within watermark is still merged") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test2")
      .outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 12:00:00"), "a"),
        (ts("2024-01-01 13:30:00"), "c"))
      q.processAllAvailable()
      // Watermark = 11:30; a 12:20 row is late but within tolerance.
      ms.addData((ts("2024-01-01 12:20:00"), "ok-late"))
      q.processAllAvailable()
      // Advance watermark past 13:00 so the 12:00 window emits.
      ms.addData((ts("2024-01-01 15:30:00"), "d"))
      q.processAllAvailable()
      val rows = spark.table("wm_test2")
        .select(col("window.start").cast("string").as("s"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows.get("2024-01-01 12:00:00") == Some(2L),
        s"in-tolerance late row must be merged: $rows")
    } finally q.stop()
  }

  test("streaming near-dup curation drops every history doc (self-collision)") {
    // A history doc (doc_id % 4 == 0) streaming through shares ALL 4
    // band minima with its own history signature, so it must always be
    // dropped: the kept-doc count has to equal the batch count of
    // quality-passing docs minus every doc whose signature collides
    // with the history index — at minimum, no quality-passing %4 doc
    // survives. Cross-check via the batch sides of the same expressions.
    val docs = graft.Tables.load(spark, sf, "documents")
    val kept = StreamingOps.streamCurateNear(spark, sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    val qualityTotal = docs.filter(LlmOps.qualityPred).count()
    val qualityHist = docs.filter(LlmOps.qualityPred)
      .filter(col("doc_id") % 4 === 0).count()
    assert(qualityHist > 0, "fixture must contain quality-passing history docs")
    assert(kept <= qualityTotal - qualityHist,
      s"kept=$kept must exclude all $qualityHist self-colliding history docs " +
        s"of $qualityTotal quality-passing docs")
    assert(kept > 0, "some non-history docs must survive")
  }

  test("stream-stream FULL OUTER pads BOTH directions after watermark") {
    // The semantics left-outer can't show: unmatched purchases emit
    // (purchase, -1) AND unmatched clicks emit (-1, click), each only
    // once the opposite side's watermark proves no match can arrive.
    // Both directions must actually appear in the drained sink, and
    // matched rows must agree with the inner join.
    val out = StreamingOps.streamStreamFullOuter(spark, sf)
    val padsLeft = out.filter(col("click_id") === -1L).count()
    val padsRight = out.filter(col("purchase_id") === -1L).count()
    assert(padsLeft > 0, "purchases with no trailing-hour click must pad")
    assert(padsRight > 0, "clicks never followed by a purchase must pad")
    val matchedFull = out
      .filter(col("click_id") =!= -1L && col("purchase_id") =!= -1L).count()
    val inner = StreamingOps.streamStreamJoin(spark, sf).count()
    assert(matchedFull === inner,
      "full outer's matched core must equal the inner join")
  }

  test("streaming heavy hitters converges to the batch sketch exactly") {
    val streamed = StreamingOps.streamHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val hh = udaf(HeavyHitters(capacity = 32, topK = 3))
    val batch = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(hh(pmod(col("user_id"), lit(16)).cast("string")).as("hh"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch,
      "micro-batch slicing must not change the exact-regime sketch")
  }

  test("stream_shard_manifest: drained counters equal the batch " +
    "manifest bit-for-bit") {
    val streamed = StreamingOps.streamShardManifest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = LlmOps.shardManifest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.sameElements(batch),
      "the commutative fold must be slicing-independent")
  }
}
