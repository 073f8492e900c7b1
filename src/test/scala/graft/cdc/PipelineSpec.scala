package graft.cdc

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Streaming pipeline (A10/A13/A14) tests: stream-vs-batch
  * differential, checkpointed restart idempotence, heartbeat listener
  * (A5), schema-history journal (A6), fail-fast on unregistered tables
  * (A15), and partition-pruned commits.
  */
class PipelineSpec extends SparkTestBase {

  private def freshStore() =
    new StateStore(graft.Scratch.dir("pipe-wh-").toString, 8)

  private def run(store: StateStore, log: DataFrame,
                  ckpt: String = graft.Scratch.dir("pipe-ck-").toString,
                  logDir: String = graft.Scratch.dir("pipe-log-").toString)
  : String = {
    log.repartition(4).write.mode("append").parquet(logDir)
    val rowSchema = log.schema("after").dataType.asInstanceOf[StructType]
    val cfg = PipelineConfig(logDir, ckpt,
      includeTables = Seq("customer", "product", "supplier"),
      triggerIntervalMs = None, maxFilesPerTrigger = 1)
    new Pipeline(store).start(spark, rowSchema, cfg).awaitTermination()
    logDir
  }

  private def customerLog: DataFrame =
    ChangeGen.changeLog(Tables.load(spark, sf, "customer"),
      "c_custkey", "c_acctbal", "commerce", "customer")

  test("stream final state equals batch compaction (differential)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    run(store, customerLog)
    val streamed = store.currentState(spark, "cdc.commerce_customer")
    val batch = Merge.compact(Envelope.flatten(customerLog), Seq("c_custkey"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("restart with same checkpoint is a no-op (A14 exactly-once)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    val ckpt = graft.Scratch.dir("pipe-ck-").toString
    val logDir = run(store, customerLog, ckpt)
    val v1 = store.currentVersion("cdc.commerce_customer")
    // Same checkpoint, same files: offsets already committed, no new
    // micro-batch, no new state version.
    val rowSchema = customerLog.schema("after").dataType.asInstanceOf[StructType]
    val cfg = PipelineConfig(logDir, ckpt,
      includeTables = Seq("customer"), triggerIntervalMs = None)
    new Pipeline(store).start(spark, rowSchema, cfg).awaitTermination()
    assert(store.currentVersion("cdc.commerce_customer") == v1)
  }

  test("heartbeat listener observes every micro-batch (A5)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val hb = new HeartbeatListener
    spark.streams.addListener(hb)
    try {
      run(freshStore(), customerLog)
      // 4 files × maxFilesPerTrigger=1 → ≥4 progress events.
      assert(hb.progressCount.get() >= 4, s"got ${hb.progressCount.get()}")
    } finally spark.streams.removeListener(hb)
  }

  test("fail-fast on events for a table without CDC enabled (A15)") {
    CdcAdmin.disableCdc("commerce.supplier")
    val log = ChangeGen.changeLog(Tables.load(spark, sf, "supplier"),
      "s_suppkey", "s_acctbal", "commerce", "supplier")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(freshStore(), log)
    }
    assert(ex.getMessage.contains("fail-fast") ||
      Option(ex.getCause).exists(_.getMessage.contains("fail-fast")))
  }

  test("schema evolution journals history and widens key (A6+A11)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    val base = Tables.load(spark, sf, "customer")
    run(store, ChangeGen.changeLogIntPk(base, "c_custkey", "c_acctbal",
      "commerce", "customer"))
    run(store, ChangeGen.evolvedChangeLog(base, "c_custkey", "c_acctbal",
      "commerce", "customer"))
    val state = store.currentState(spark, "cdc.commerce_customer")
    assert(state.schema("c_custkey").dataType == LongType)
    assert(state.columns.contains("note"))
    val hist = java.nio.file.Paths.get(store.warehouse,
      "cdc.commerce_customer", "schema-history.jsonl")
    val lines = Files.readAllLines(hist)
    assert(lines.size() >= 2, "journal has initial + evolved schema")
    assert(lines.get(lines.size() - 1).contains("note"))
  }

  test("ProcessingTime trigger ingests files as they arrive (A13 live mode)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    val logDir = graft.Scratch.dir("pipe-live-").toString
    val target = "cdc.commerce_customer"
    val log = customerLog
    val rowSchema = log.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val cfg = PipelineConfig(logDir,
      graft.Scratch.dir("pipe-live-ck-").toString,
      includeTables = Seq("customer"),
      triggerIntervalMs = Some(500L), maxFilesPerTrigger = 10)
    val q = new Pipeline(store).start(spark, rowSchema, cfg)

    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $what")
        Thread.sleep(300)
      }
    }
    try {
      // Wave 1: snapshot + stale events.
      log.filter(col("ts_ms") <= 1000).write.mode("append").parquet(logDir)
      await(store.exists(target) &&
        store.currentState(spark, target).count() ==
          Tables.load(spark, sf, "customer").count(),
        "snapshot wave materialized")
      // Wave 2: updates + deletes arriving later.
      log.filter(col("ts_ms") > 1000).write.mode("append").parquet(logDir)
      val want = Merge.compact(Envelope.flatten(log), Seq("c_custkey"))
      await(store.currentState(spark, target).count() == want.count(),
        "update/delete wave merged")
      val got = store.currentState(spark, target)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("commit recovers from crash debris at the next version (A14)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    run(store, customerLog)
    val target = "cdc.commerce_customer"
    val v = store.currentVersion(target)
    val stateCount = store.currentState(spark, target).count()
    // Simulate a crashed commit: next-version manifest + data dir exist
    // but _VERSION never moved. A replayed merge must clean up and
    // succeed, not wedge.
    val d = java.nio.file.Paths.get(store.warehouse, target)
    Files.writeString(d.resolve(s"manifest-${v + 1}.tsv"), "0\tv999/junk")
    Files.createDirectories(d.resolve(s"v${v + 1}"))
    Files.writeString(d.resolve(s"v${v + 1}/leftover.txt"), "debris")
    val oneKey = ChangeGen.changeLog(
      Tables.load(spark, sf, "customer").filter(col("c_custkey") === 2),
      "c_custkey", "c_acctbal", "commerce", "customer")
      .filter(col("ts_ms") === 1000)
    run(store, oneKey)
    assert(store.currentVersion(target) == v + 1)
    assert(store.currentState(spark, target).count() == stateCount)
    assert(!store.manifest(target).values.exists(_.contains("v999")),
      "debris manifest must have been replaced")
  }

  test("compaction + vacuum keep state identical and drop old versions") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    run(store, customerLog)
    val target = "cdc.commerce_customer"
    val before = store.currentState(spark, target)
      .collect().map(_.toString).sorted
    val vCompact = store.compactTable(spark, target)
    assert(store.currentVersion(target) == vCompact)
    // Compaction points every bucket at the fresh version dir.
    assert(store.manifest(target).values.forall(_.startsWith(s"v$vCompact/")))
    val after = store.currentState(spark, target)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after))
    store.vacuum(target, keepVersions = 1)
    // Old version dirs are gone; current still reads fine.
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(store.warehouse, target, "v0")))
    assert(store.currentState(spark, target).count() == before.length)
  }

  test("time travel: old versions stay readable after later commits") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    run(store, customerLog)
    val target = "cdc.commerce_customer"
    val v1 = store.currentVersion(target)
    val countV1 = store.currentState(spark, target).count()
    // Commit a delta on top, then read the old version back.
    val oneKey = ChangeGen.changeLog(
      Tables.load(spark, sf, "customer").filter(col("c_custkey") === 1),
      "c_custkey", "c_acctbal", "commerce", "customer")
      .filter(col("ts_ms") === 1000)
    run(store, oneKey)
    assert(store.currentVersion(target) > v1)
    assert(store.stateAt(spark, target, v1).count() == countV1)
    assert(store.stateAt(spark, target, v1)
      .filter(col("c_custkey") === 1).count() ==
      store.currentState(spark, target).filter(col("c_custkey") === 1).count())
  }

  test("snapshot bootstrap then stream: snapshot loses to every event (A1)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    val base = Tables.load(spark, sf, "customer")
    val pipe = new Pipeline(store)
    pipe.snapshot(base, "commerce", "customer")
    val afterSnap = store.currentState(spark, "cdc.commerce_customer")
    assert(afterSnap.count() == base.count())
    // Stream the full log on top: ts=0 snapshot must lose to all
    // events, so the final state equals the batch compaction.
    run(store, customerLog)
    val streamed = store.currentState(spark, "cdc.commerce_customer")
    val batch = Merge.compact(Envelope.flatten(customerLog), Seq("c_custkey"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("commit rewrites only affected buckets (partition-pruned write)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = freshStore()
    run(store, customerLog)
    val m1 = store.manifest("cdc.commerce_customer")
    val v1 = store.currentVersion("cdc.commerce_customer")
    // A single-key update touches exactly one bucket; every other
    // manifest entry must keep pointing at its existing directory.
    val base = Tables.load(spark, sf, "customer").filter(col("c_custkey") === 1)
    val oneKey = ChangeGen.changeLog(base, "c_custkey", "c_acctbal",
      "commerce", "customer").filter(col("ts_ms") === 1000)
    run(store, oneKey)
    val m2 = store.manifest("cdc.commerce_customer")
    val v2 = store.currentVersion("cdc.commerce_customer")
    assert(v2 > v1)
    val changed = m2.filter { case (b, p) => !m1.get(b).contains(p) }
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    assert(changed.values.forall(_.startsWith(s"v$v2/")))
  }
}
