package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.cdc.{ChangeGen, Envelope, MergeCommit, StateStore}

/** Orphan-file GC invariants beyond the oracle's fixed counts. */
class OrphanGcSpec extends SparkTestBase {

  test("a clean store has no orphans; GC preserves committed state") {
    val wh = graft.Scratch.dir("gc-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "t"
    val ev = Envelope.flatten(ChangeGen.changeLog(
      Tables.load(spark, sf, "customer"),
      "c_custkey", "c_acctbal", "commerce", "customer"))
    MergeCommit.mergeFlattened(store, target, ev, Seq("c_custkey"))
    assert(store.removeOrphans(target) == 0,
      "a healthy commit history must contain zero orphans")
    val before = store.currentState(spark, target).collect().toSet
    // Debris from two separate failed attempts, both above the pointer.
    val d = java.nio.file.Paths.get(wh, target)
    val cur = store.currentVersion(target)
    for (v <- Seq(cur + 1, cur + 3)) {
      val dir = d.resolve(s"v$v")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("junk"), "x")
    }
    assert(store.removeOrphans(target) == 4,
      "two dirs + two junk files must be swept")
    assert(store.removeOrphans(target) == 0, "GC must be idempotent")
    assert(store.currentState(spark, target).collect().toSet == before,
      "GC must never alter the committed state")
  }

  test("orphan query: both steps report ok with state checksums intact") {
    val rows = MaintenanceQueries.orphanVacuum(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getBoolean(4), s"step ${r.getString(0)} not ok"))
    assert(rows.map(_.getString(0)).toSet == Set("gc", "idempotent"))
  }

  test("cdc_freshness: freshest topic lags zero; supplier trails by the " +
    "evolution wave") {
    val rows = CdcQueries.freshness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    assert(rows("cdc.commerce_customer") == 0L,
      "the topic carrying the newest event must have zero lag")
    assert(rows("cdc.commerce_supplier") == 1000L,
      "supplier must trail by exactly the ts=5000 evolution wave gap")
  }

  test("llm_mm_dedup: every dropped row is a staged re-upload naming its " +
    "original") {
    val rows = graft.ops.LlmOps.mmDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dropped, keptFor) = (r.getLong(0), r.getLong(1))
      assert(dropped >= 10000L && dropped % 5 == 0,
        s"only staged re-uploads may drop, got $dropped")
      assert(keptFor == dropped - 10000L,
        s"$dropped must name its original ${dropped - 10000L}, got $keptFor")
      assert(r.getLong(4) == 2L, "each staged group has exactly two copies")
    }
  }
}
