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
}
