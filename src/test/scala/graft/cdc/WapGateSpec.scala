package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The WAP gate's batch-level contracts that the end-to-end
  * `cdc_pipeline_wap` replay can't isolate:
  *   1. two targets failing the audit in ONE micro-batch land in
  *      DISJOINT quarantine slots — the second drop must not overwrite
  *      the first target's quarantined envelope slice;
  *   2. the audit scopes to rows the batch introduced/rewrote — a
  *      violating row already committed BEFORE the gate was enabled
  *      must not poison every later clean batch that hashes into its
  *      bucket;
  *   3. a batch that itself introduces a violation still drops.
  */
class WapGateSpec extends SparkTestBase {
  import spark.implicits._

  private def events(table: String, rows: Seq[(Long, Double)],
                     ts: Long): DataFrame = {
    val base = rows.toDF("k", "amount")
    val image = struct(col("k"), col("amount"))
    base.select(
      when(lit(false), image).as("before"), image.as("after"),
      lit(Envelope.OpUpdate).as("op"), lit(ts).as("ts_ms"),
      col("k").as("seq"),
      struct(lit("wapg").as("schema"), lit(table).as("table")).as("source"))
  }

  private def routed(ev: DataFrame): DataFrame =
    Routing.route(Envelope.flatten(ev))

  private def quarantineSlices(qdir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(qdir)
    if (!Files.exists(root)) return Map.empty
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p))
      .map { tdir =>
        tdir.getFileName.toString ->
          spark.read.parquet(tdir.toString).count()
      }.toMap
    finally s.close()
  }

  test("two targets failing one micro-batch quarantine into disjoint " +
      "slots; neither overwrites the other") {
    CdcAdmin.enableCdc("wapg.a", Seq("k"))
    CdcAdmin.enableCdc("wapg.b", Seq("k"))
    val store = new StateStore(
      graft.Scratch.dir("graft-wapgate-").toString, 4)
    val qdir = graft.Scratch.dir("graft-wapgate-q-").toString
    val gate = WapGate(col("amount") < 0.0, qdir)
    val pipe = new Pipeline(store, Some(gate))
    val batch = routed(
      events("a", (0L until 10L).map(k =>
        k -> (if (k == 3L) -5.0 else k.toDouble)), ts = 100)
        .unionByName(events("b", (0L until 7L).map(k =>
          k -> (if (k == 5L) -7.0 else k.toDouble)), ts = 100)))
    pipe.processBatch(batch, batchId = 7L)
    assert(store.currentVersion("cdc.wapg_a") === -1 &&
      store.currentVersion("cdc.wapg_b") === -1,
      "neither poisoned merge may publish")
    val slices = quarantineSlices(qdir)
    assert(slices === Map("target=cdc.wapg_a" -> 10L,
      "target=cdc.wapg_b" -> 7L),
      s"each target keeps its own full envelope slice, got $slices")
  }

  test("a gated batch that evolves the schema (new column) publishes " +
      "cleanly; the audit tag never reaches the committed schema") {
    CdcAdmin.enableCdc("wapg.evo", Seq("k"))
    val store = new StateStore(
      graft.Scratch.dir("graft-wapgate3-").toString, 4)
    val qdir = graft.Scratch.dir("graft-wapgate3-q-").toString
    val gated = new Pipeline(store, Some(WapGate(col("amount") < 0.0, qdir)))
    gated.processBatch(routed(
      events("evo", (0L until 6L).map(k => k -> k.toDouble), ts = 100)), 0L)
    assert(store.currentVersion("cdc.wapg_evo") === 0)

    // Second gated batch carries an EXTRA column — A11 add-column
    // through the gated merge path.
    val rows = (0L until 6L).map(k => (k, k + 10.0, s"note$k"))
    val base = rows.toDF("k", "amount", "note")
    val image = struct(col("k"), col("amount"), col("note"))
    val ev = base.select(
      when(lit(false), image).as("before"), image.as("after"),
      lit(Envelope.OpUpdate).as("op"), lit(200L).as("ts_ms"),
      col("k").as("seq"),
      struct(lit("wapg").as("schema"), lit("evo").as("table")).as("source"))
    gated.processBatch(routed(ev), 1L)
    assert(store.currentVersion("cdc.wapg_evo") === 1,
      "a clean evolving batch must publish")
    val schema = store.schemaOf("cdc.wapg_evo")
    assert(schema.fieldNames.contains("note"),
      "the evolved column must reach the committed schema")
    assert(!schema.fieldNames.exists(_.contains("_gate_batch")),
      "the audit tag must never leak into the committed schema")
    val state = store.currentState(spark, "cdc.wapg_evo")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(state(3L) === "note3")
  }

  test("a violating row committed BEFORE the gate does not block later " +
      "clean batches; a batch's own violation still drops") {
    CdcAdmin.enableCdc("wapg.pre", Seq("k"))
    val store = new StateStore(
      graft.Scratch.dir("graft-wapgate2-").toString, 4)
    // v0 lands UNGATED with k=3 violating (amount -5) — e.g. written
    // before the expectation existed.
    new Pipeline(store).processBatch(routed(
      events("pre", (0L until 10L).map(k =>
        k -> (if (k == 3L) -5.0 else k.toDouble)), ts = 100)), 0L)
    assert(store.currentVersion("cdc.wapg_pre") === 0)

    val qdir = graft.Scratch.dir("graft-wapgate2-q-").toString
    val gated = new Pipeline(store, Some(WapGate(col("amount") < 0.0, qdir)))
    // A clean batch over every key EXCEPT 3: its buckets include k=3's,
    // whose stored violating row sits in the post-merge slice — the
    // audit must scope to the batch's own keys and publish.
    gated.processBatch(routed(
      events("pre", (0L until 10L).filter(_ != 3L).map(k =>
        k -> (k + 1000.0)), ts = 200)), 1L)
    assert(store.currentVersion("cdc.wapg_pre") === 1,
      "a clean batch must publish despite the pre-gate violating row")
    assert(quarantineSlices(qdir).isEmpty, "nothing to quarantine")
    // The pre-existing violation is untouched, the clean wave applied.
    val state = store.currentState(spark, "cdc.wapg_pre")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === -5.0 && state(0L) === 1000.0)

    // A batch that ITSELF writes a violation still drops + quarantines.
    gated.processBatch(routed(
      events("pre", Seq(4L -> -1.0), ts = 300)), 2L)
    assert(store.currentVersion("cdc.wapg_pre") === 1,
      "the violating batch must not publish")
    assert(quarantineSlices(qdir) === Map("target=cdc.wapg_pre" -> 1L))
  }
}
