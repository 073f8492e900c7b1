package graft.cdc

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.streaming.StreamingQueryException

/** Wire-format pipeline: FAILFAST on corrupt records (A15 —
  * errors.tolerance=none) and multi-table fan-out equivalence.
  */
class WirePipelineSpec extends SparkTestBase {

  test("corrupt wire record fails the stream, never silent nulls (A15)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = new StateStore(
      graft.Scratch.dir("wire-wh-").toString, 4)
    val base = Tables.load(spark, sf, "customer")
    val wire = Envelope.toWire(ChangeGen.changeLog(base,
      "c_custkey", "c_acctbal", "commerce", "customer"))
    val logDir = graft.Scratch.dir("wire-log-")
    wire.coalesce(1).write.mode("append").text(logDir.toString)
    // Append one corrupt line that still parses as valid metadata (so
    // it passes the include filter) but has a malformed row image.
    Files.writeString(logDir.resolve("corrupt.txt"),
      """{"op":"u","ts_ms":9,"seq":9,"source":{"schema":"commerce","table":"customer"},"after":{"c_custkey":"NOT_A_NUMBER_{"}}""" + "\n")
    val cfg = PipelineConfig(logDir.toString,
      graft.Scratch.dir("wire-ck-").toString,
      includeTables = Seq("customer"), triggerIntervalMs = None,
      maxFilesPerTrigger = 10)
    val ex = intercept[StreamingQueryException] {
      new Pipeline(store).startWire(spark, cfg,
        Map("commerce.customer" -> base.schema)).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("FAILFAST") || m.contains("Malformed") ||
        m.contains("fail-fast") || m.contains("BadRecord")),
      s"expected a parse failure, got: ${messages(ex).mkString(" | ")}")
  }

  test("malformed transport JSON also fails the stream (A15 metadata layer)") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = new StateStore(
      graft.Scratch.dir("wire-wh-").toString, 4)
    val base = Tables.load(spark, sf, "customer")
    val logDir = graft.Scratch.dir("wire-log-")
    Files.writeString(logDir.resolve("garbage.txt"),
      """{"op":"u","ts_ms":""" + "\n")
    val cfg = PipelineConfig(logDir.toString,
      graft.Scratch.dir("wire-ck-").toString,
      includeTables = Seq("customer"), triggerIntervalMs = None)
    intercept[StreamingQueryException] {
      new Pipeline(store).startWire(spark, cfg,
        Map("commerce.customer" -> base.schema)).awaitTermination()
    }
  }

  test("well-formed JSON without source metadata fails, not silently dropped") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    val store = new StateStore(
      graft.Scratch.dir("wire-wh-").toString, 4)
    val base = Tables.load(spark, sf, "customer")
    val logDir = graft.Scratch.dir("wire-log-")
    Files.writeString(logDir.resolve("nosource.txt"),
      """{"op":"u","ts_ms":9,"seq":9}""" + "\n")
    val cfg = PipelineConfig(logDir.toString,
      graft.Scratch.dir("wire-ck-").toString,
      includeTables = Seq("customer"), triggerIntervalMs = None)
    val ex = intercept[StreamingQueryException] {
      new Pipeline(store).startWire(spark, cfg,
        Map("commerce.customer" -> base.schema)).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("without source metadata")),
      s"expected the no-source guard: ${messages(ex).mkString(" | ")}")
  }

  test("wire fan-out merges two tables to the same state as per-table batch") {
    CdcAdmin.enableCdc("commerce.customer", Seq("c_custkey"))
    CdcAdmin.enableCdc("commerce.supplier", Seq("s_suppkey"))
    val store = new StateStore(
      graft.Scratch.dir("wire-wh-").toString, 4)
    val cust = Tables.load(spark, sf, "customer")
    val supp = Tables.load(spark, sf, "supplier")
    val custLog = ChangeGen.changeLog(cust, "c_custkey", "c_acctbal",
      "commerce", "customer")
    val suppLog = ChangeGen.changeLog(supp, "s_suppkey", "s_acctbal",
      "commerce", "supplier")
    val wire = Envelope.toWire(custLog).unionAll(Envelope.toWire(suppLog))
    val logDir = graft.Scratch.dir("wire-log-")
    wire.repartition(4).write.mode("overwrite").text(logDir.toString)
    val cfg = PipelineConfig(logDir.toString,
      graft.Scratch.dir("wire-ck-").toString,
      includeTables = Seq("customer", "supplier"),
      triggerIntervalMs = None, maxFilesPerTrigger = 1)
    new Pipeline(store).startWire(spark, cfg, Map(
      "commerce.customer" -> cust.schema,
      "commerce.supplier" -> supp.schema)).awaitTermination()
    val gotCust = store.currentState(spark, "cdc.commerce_customer")
    val wantCust = Merge.compact(Envelope.flatten(custLog), Seq("c_custkey"))
    val gotSupp = store.currentState(spark, "cdc.commerce_supplier")
    val wantSupp = Merge.compact(Envelope.flatten(suppLog), Seq("s_suppkey"))
    assert(gotCust.exceptAll(wantCust).isEmpty &&
      wantCust.exceptAll(gotCust).isEmpty)
    assert(gotSupp.exceptAll(wantSupp).isEmpty &&
      wantSupp.exceptAll(gotSupp).isEmpty)
  }
}
