package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Spark 4's transformWithState (StatefulProcessor + typed state
  * handles over the RocksDB state store) — the successor API to
  * mapGroupsWithState for arbitrary streaming state (SURVEY §2 Tier C
  * "arbitrary state" row). Demonstrated as a per-key running counter
  * driven by MemoryStream across multiple micro-batches.
  */
class RunningCount extends StatefulProcessor[String, (String, Int), (String, Long)] {
  @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
                               timerValues: TimerValues): Iterator[(String, Long)] = {
    val prev = if (count.exists()) count.get() else 0L
    val next = prev + rows.size
    count.update(next)
    Iterator.single((key, next))
  }
}

class TransformWithStateSpec extends SparkTestBase {

  test("transformWithState keeps per-key state across micro-batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, Int)]
      val counted = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningCount, TimeMode.None(),
          OutputMode.Update())
        .toDF("k", "n")
      val q = counted.writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      try {
        ms.addData(("a", 1), ("a", 2), ("b", 3))
        q.processAllAvailable()
        ms.addData(("a", 4))
        q.processAllAvailable()
        val byBatchMax = spark.table("tws_test")
          .groupBy("k").max("n").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(byBatchMax == Map("a" -> 3L, "b" -> 1L),
          s"running counts wrong: $byBatchMax")
      } finally q.stop()
    } finally
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time TIMERS close inactive sessions exactly once " +
      "(register/re-arm/delete + handleExpiredTimer)") {
    // The timer surface of transformWithState — the one streaming
    // primitive the window/watermark operators can't express: emit
    // BECAUSE nothing arrived. Each key re-arms an inactivity timer at
    // (last event + gap); when the WATERMARK passes it, the expired
    // session emits once and clears. Controlled MemoryStream batches
    // make firing deterministic: the watermark a batch raises applies
    // in the next batch.
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: String): java.sql.Timestamp =
        java.sql.Timestamp.valueOf(s)
      val ms = MemoryStream[(Long, java.sql.Timestamp)]
      val sessions = ms.toDF().toDF("user", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new InactivityDetector(gapMs = 3600 * 1000L),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user", "last_ms", "n_events")
      val q = sessions.writeStream.format("memory").queryName("timer_test")
        .outputMode("append").start()
      try {
        // Session opens: u1 two events, u2 one.
        ms.addData((1L, ts("2024-01-01 10:00:00")),
          (1L, ts("2024-01-01 10:30:00")),
          (2L, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        // u1 extends its session (timer must RE-ARM, not fire early);
        // watermark stays at 10:45 so nothing expires yet.
        ms.addData((1L, ts("2024-01-01 10:45:00")))
        q.processAllAvailable()
        assert(spark.table("timer_test").count() === 0,
          "no session may close before the watermark passes its gap")
        // u3 pushes the watermark to 13:00...
        ms.addData((3L, ts("2024-01-01 13:00:00")))
        q.processAllAvailable()
        // ...which is APPLIED in the next batch: both stale timers
        // (u1 @ 11:45, u2 @ 11:00) fire exactly once.
        ms.addData((4L, ts("2024-01-01 13:00:01")))
        q.processAllAvailable()
        val out = spark.table("timer_test").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(out === Set(
          (1L, ts("2024-01-01 10:45:00").getTime, 3L),
          (2L, ts("2024-01-01 10:00:00").getTime, 1L)),
          s"expected exactly the two closed sessions, got $out")
      } finally q.stop()
    } finally
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("PROCESSING-TIME timers heartbeat through dataless batches " +
      "and converge on the true totals") {
    // The wall-clock half of the timer surface: a key arms one timer,
    // emits its running snapshot on expiry, and re-arms — so it keeps
    // emitting in batches that carry NONE of its data. interval=1ms
    // makes "expired by the next batch" deterministic (batch
    // timestamps advance by the batch's own wall time).
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime state answers shouldRunAnotherBatch=true forever;
    // without this, the engine hot-loops no-data timer batches and
    // processAllAvailable never returns (measured).
    session.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      "false")
    try {
      val ms = MemoryStream[(Long, Double)]
      val flushed = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new PeriodicFlusher(intervalMs = 1L),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .toDF("k", "n", "s")
      val q = flushed.writeStream.format("memory").queryName("pt_timer")
        .outputMode("append").start()
      try {
        // The engine services due timers in whatever batch runs next —
        // a data batch or a spontaneous timer batch — so assertions
        // here are on CONVERGED per-key flush sets, never on which
        // batch carried the flush.
        ms.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
        q.processAllAvailable()
        // A batch carrying only key 3's data fires keys 1 and 2's
        // due timers — they flush in a batch with NONE of their data.
        ms.addData((3L, 1.0))
        q.processAllAvailable()
        val flushed12 = spark.table("pt_timer")
          .filter($"k" <= 2L).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(flushed12 === Set((1L, 2L, 15.0), (2L, 1L, 7.0)),
          s"armed keys must flush exactly once per dirty cycle, got " +
            s"$flushed12")
        // New data re-dirties and re-arms key 1; the next batch's
        // timer service flushes the UPDATED snapshot — and only it
        // (the dirty-gate suppresses idle heartbeat duplicates, which
        // is also what lets Trigger.AvailableNow drain).
        ms.addData((1L, 3.0))
        q.processAllAvailable()
        ms.addData((4L, 2.0))
        q.processAllAvailable()
        val k1 = spark.table("pt_timer").filter($"k" === 1L).collect()
          .map(r => (r.getLong(1), r.getDouble(2))).toSet
        assert(k1 === Set((2L, 15.0), (3L, 18.0)),
          s"key 1 must flush once per dirty cycle, got $k1")
        val k3 = spark.table("pt_timer").filter($"k" === 3L).collect()
          .map(r => (r.getLong(1), r.getDouble(2))).toSet
        assert(k3 === Set((1L, 1.0)), s"key 3's flush must arrive, got $k3")
      } finally q.stop()
    } finally {
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
      session.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("TTL state expires: a deduped key re-emits after its marker " +
      "lapses, and never before") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    session.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    session.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      "false")
    try {
      val ms = MemoryStream[(Long, String)]
      val deduped = ms.toDS()
        .groupByKey(identity)
        .transformWithState(
          new TtlDedup(java.time.Duration.ofSeconds(3)),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .toDF("user_id", "event_type")
      val q = deduped.writeStream.format("memory").queryName("ttl_dedup")
        .outputMode("append").start()
      try {
        ms.addData((1L, "click"), (1L, "click"), (2L, "view"))
        q.processAllAvailable()
        // Within the TTL: the marker holds, duplicates stay silent.
        ms.addData((1L, "click"))
        q.processAllAvailable()
        assert(spark.table("ttl_dedup").count() === 2,
          "inside the TTL a key must emit exactly once")
        // Past the TTL: the marker has lapsed, the key re-emits.
        Thread.sleep(4000)
        ms.addData((1L, "click"))
        q.processAllAvailable()
        val emits = spark.table("ttl_dedup")
          .filter($"user_id" === 1L).count()
        assert(emits === 2,
          "after the TTL the marker must have expired and re-emit")
      } finally q.stop()
    } finally {
      session.conf.unset("spark.sql.streaming.stateStore.providerClass")
      session.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }
}
