package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the maintenance views that the oracle hash
  * alone doesn't pin by name: SCD2's interval-chain integrity, and
  * table_changes' class coverage including the delete-of-absent-key
  * no-op.
  */
class MaintenanceQueriesSpec extends SparkTestBase {

  test("scd2 history chains are contiguous and end in exactly one " +
      "current version per surviving key") {
    val hist = MaintenanceQueries.scd2(spark, sf).persist()
    try {
      // Intervals chain: within a key, each version's valid_to equals
      // the next version's valid_from (lead over the same order).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_custkey").orderBy("valid_from")
      val broken = hist
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("next_from").isNotNull &&
          col("valid_to") =!= col("next_from"))
        .count()
      assert(broken === 0, "non-contiguous validity chain")

      // Keys deleted at ts=4000 (pk%7==0) have NO current version —
      // their last interval is closed by the delete event; every other
      // key has exactly one open interval.
      val currents = hist.groupBy("c_custkey")
        .agg(sum(col("is_current").cast("int")).as("n_current"))
      assert(currents.filter(col("c_custkey") % 7 === 0)
        .filter(col("n_current") =!= 0).count() === 0,
        "deleted key still has an open version")
      assert(currents.filter(col("c_custkey") % 7 =!= 0)
        .filter(col("n_current") =!= 1).count() === 0,
        "surviving key without exactly one current version")

      // The current image equals the merged state the rest of the
      // suite trusts: SCD2's open intervals ARE the current table.
      val current = hist.filter(col("is_current"))
        .select(col("c_custkey"), col("c_acctbal"))
      val merged = CdcQueries.mergeCustomer(spark, sf)
        .select(col("c_custkey"), col("c_acctbal"))
      assert(current.exceptAll(merged).isEmpty &&
        merged.exceptAll(current).isEmpty,
        "open SCD2 intervals diverge from the merged current state")
    } finally hist.unpersist(blocking = false)
  }

  test("table_changes emits all three classes and drops deletes of " +
      "keys absent from v1") {
    val ch = MaintenanceQueries.tableChanges(spark, sf).persist()
    try {
      val byClass = ch.groupBy("change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byClass.keySet === Set("insert", "update", "delete"))
      // v1 = even keys only (stale wave); classes follow the script:
      // delete ⇔ even & %7, update ⇔ even & not %7, insert ⇔ odd &
      // not %7. Odd %7 keys (delete of a key v1 never had) are absent.
      val n = Tables.load(spark, sf, "customer")
        .select(col("c_custkey") % 2 === 0, col("c_custkey") % 7 === 0)
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
      def cnt(f: ((Boolean, Boolean)) => Boolean) = n.count(f).toLong
      assert(byClass("delete") === cnt { case (e, s) => e && s })
      assert(byClass("update") === cnt { case (e, s) => e && !s })
      assert(byClass("insert") === cnt { case (e, s) => !e && !s })
      val absentDeletes = ch
        .filter(col("c_custkey") % 2 =!= 0 && col("c_custkey") % 7 === 0)
        .count()
      assert(absentDeletes === 0,
        "delete of a key absent from v1 must be a no-op")
    } finally ch.unpersist(blocking = false)
  }

  test("log-derived table_changes agrees with a materialized snapshot " +
      "diff of the two versions") {
    import graft.cdc.{ChangeGen, Envelope, Merge}
    val flat = Envelope.flatten(ChangeGen.changeLog(
      Tables.load(spark, sf, "customer"),
      "c_custkey", "c_acctbal", "commerce", "customer"))
    def stateAt(maxTs: Long) =
      Merge.compact(flat.filter(col("_cdc.ts_ms") <= maxTs), Seq("c_custkey"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"))
    val v1 = stateAt(500L)
    val v2 = stateAt(Long.MaxValue)
    val diff = v1.as("a").join(v2.as("b"), Seq("c_custkey"), "full_outer")
      .select(col("c_custkey"),
        when(col("a.c_acctbal").isNull, "insert")
          .when(col("b.c_acctbal").isNull, "delete")
          .otherwise("update").as("change_type"),
        coalesce(col("b.c_acctbal"), col("a.c_acctbal")).as("c_acctbal"))
    val ch = MaintenanceQueries.tableChanges(spark, sf)
    // Keys + classes must match exactly. Values match for inserts and
    // updates (the post-image); delete rows deliberately carry the
    // delete EVENT's before-image (Debezium's convention), not the v1
    // snapshot value — the stale wave makes those differ, so deletes
    // compare by key only.
    val a = ch.select("c_custkey", "change_type")
    val b = diff.select("c_custkey", "change_type")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "class/key sets diverge between log-derived and snapshot diff")
    val av = ch.filter(col("change_type") =!= "delete")
      .select("c_custkey", "c_acctbal", "change_type")
    val bv = diff.filter(col("change_type") =!= "delete")
      .select("c_custkey", "c_acctbal", "change_type")
    assert(av.exceptAll(bv).isEmpty && bv.exceptAll(av).isEmpty,
      "insert/update post-images diverge from the v2 snapshot")
  }

  test("replaying the compacted change log converges to the same " +
      "final state as the full log") {
    def finalState(ev: org.apache.spark.sql.DataFrame) =
      ev.groupBy("c_custkey")
        .agg(max_by(struct(col("bal"), col("op")), col("ts")).as("l"))
        .filter(col("l.op") =!= "d")
        .select(col("c_custkey"), col("l.bal").as("bal"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = MaintenanceQueries.logCompact(spark, sf)
    // The compacted log IS an event stream: replay it.
    val replayed = finalState(full)
    val original = finalState(
      graft.cdc.Envelope.flatten(graft.cdc.ChangeGen.changeLog(
          graft.Tables.load(spark, sf, "customer"),
          "c_custkey", "c_acctbal", "commerce", "customer"))
        .select(col("row.c_custkey").as("c_custkey"),
          round(col("row.c_acctbal"), 2).as("bal"),
          col("_cdc.op").as("op"), col("_cdc.ts_ms").as("ts")))
    assert(replayed.nonEmpty && replayed === original,
      "compaction must preserve replay semantics")
    // History inside the horizon survives verbatim: the %5 update wave
    // and the delete wave are both still in the compacted log.
    val ops = full.select("op", "ts").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops.contains(("u", 3000L)) && ops.contains(("d", 4000L)))
    // Pre-horizon history is folded: no stale ts=500 record survives.
    assert(!ops.exists(_._2 == 500L), "pre-horizon events must fold away")
  }

  test("maintenance_lifecycle is idempotent per JVM: the cached store " +
      "dir is wiped and rebuilt from version 0 on every invocation") {
    val a = MaintenanceQueries.maintenanceLifecycle(spark, sf).collect()
    val b = MaintenanceQueries.maintenanceLifecycle(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_.getBoolean(3)),
      s"every lifecycle invariant must hold: ${a.mkString(", ")}")
  }

  test("compacting a shallow clone detaches it from the source; " +
      "restore past vacuum fails loudly; rolled-past versions stay " +
      "time-travelable until then") {
    val rows = MaintenanceQueries.cloneRestore(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)),
      s"every clone/restore invariant must hold: ${rows.mkString(", ")}")
    val store = MaintenanceQueries.cloneStore(sf)
    val (src, dst) = ("cdc.commerce_customer_cl", "cdc.commerce_customer_cl_clone")

    // At birth the clone's manifest reaches into the source dir;
    // compaction folds every row under the clone's own dir.
    assert(store.manifest(dst).values.exists(_.startsWith("..")),
      "fresh shallow clone must reference source data dirs")
    val before = store.currentState(spark, dst)
    store.compactTable(spark, dst)
    assert(store.manifest(dst).values.forall(!_.startsWith("..")),
      "compacted clone must own every referenced dir")
    val after = store.currentState(spark, dst)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "detach-by-compaction changed the clone's state")

    // The source sits at the restored version (v2: wave, wave, delete,
    // restore → 3? — derive, don't hardcode); its delete-wave version
    // is still one travel hop back, and after vacuum the pre-restore
    // manifests are gone so a second restore to them must refuse.
    val cur = store.currentVersion(src)
    val deletedState = store.stateAt(spark, src, cur - 1)
    assert(deletedState.filter(col("c_custkey") % 7 === 0).count() === 0,
      "the rolled-past delete-wave version must stay readable")
    store.vacuum(src, keepVersions = 1)
    val ex = intercept[IllegalArgumentException] {
      store.restore(src, cur - 1)
    }
    assert(ex.getMessage.contains("vacuumed"),
      s"restore past vacuum must name the cause: ${ex.getMessage}")
  }
}
