package graft.cdc

import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Persisted commit instants (`commits.jsonl` — ADVICE r13, medium):
  * timestamp resolution must survive maintenance that rewrites
  * manifest FILES. [[StateStore.purgeKeys]] atomically rewrites every
  * retained manifest (resetting their mtimes to the purge instant), so
  * an mtime-derived instant would mis-resolve all historical markers
  * after any purge; the sidecar instant must not move. Also pins
  * strict monotonicity (two metadata-only commits in the same
  * millisecond still resolve distinctly) and the restore stamping its
  * OWN instant rather than inheriting the restored-to version's.
  */
class CommitTimeSpec extends SparkTestBase {

  private def freshStore(tag: String): (StateStore, String) = {
    val wh = graft.Scratch.dir(s"graft-$tag-").toString
    (new StateStore(wh, nBuckets = 4), s"cdc.${tag}_t")
  }

  private def wave(store: StateStore, target: String,
                   df: org.apache.spark.sql.DataFrame, ts: Long,
                   deleted: Boolean = false): Unit = {
    val pk = Seq("s_suppkey")
    MergeCommit.mergeBatchMeta(store, target, df
      .withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
      .withColumn(StateStore.DeletedCol, lit(deleted))
      .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
    ()
  }

  test("purge rewrites every manifest but historical markers still " +
      "resolve; instants stay strictly monotone") {
    val (store, target) = freshStore("ctime")
    val sup = Tables.load(spark, sf, "supplier")
    wave(store, target, sup, 1000L)                                    // v0
    wave(store, target, sup.filter(col("s_suppkey") % 3 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + 100.0), 2000L)       // v1
    wave(store, target, sup.filter(col("s_suppkey") % 5 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + 200.0), 3000L)       // v2

    val instants = (0 to 2).map(v => store.commitTimeOf(target, v))
    assert(instants == instants.sorted && instants.distinct == instants,
      s"commit instants must be strictly monotone, got $instants")
    val t1 = instants(0)
    assert(store.versionAtTime(target, t1) == 0)

    // The erasure rewrites EVERY retained manifest (fresh mtimes).
    val erased = store.purgeKeys(spark, target, "s_suppkey",
      Seq(0L, 15L, 30L))
    assert(erased > 0)

    // Resolution is unchanged: the marker still names v0, the instants
    // did not move, and monotonicity survives the rewrite.
    assert(store.versionAtTime(target, t1) == 0,
      "a pre-purge marker must still resolve to its version " +
        "(mtime-derived resolution broke here: every manifest's mtime " +
        "is now the purge instant)")
    assert((0 to 2).map(v => store.commitTimeOf(target, v)) == instants,
      "purge must not move any commit instant")
    // ...and the purged state at the marker no longer holds the keys.
    assert(store.stateAtTime(spark, target, t1)
      .filter(col("s_suppkey").isin(0L, 15L, 30L)).count() == 0L,
      "erasure applies to every retained snapshot, markers included")
  }

  test("metadata-only commits in the same millisecond resolve " +
      "distinctly; restore stamps its own instant") {
    val (store, target) = freshStore("ctime2")
    val sup = Tables.load(spark, sf, "supplier").limit(20)
    wave(store, target, sup, 1000L)                                    // v0
    wave(store, target, sup.withColumn("s_acctbal",
      col("s_acctbal") + 1.0), 2000L)                                  // v1
    // Two pointer-only restores back-to-back — far sub-millisecond
    // apart on any filesystem; the monotone stamp keeps them distinct.
    val v2 = store.restore(target, 0)
    val v3 = store.restore(target, 1)
    val ts = (0 to 3).map(v => store.commitTimeOf(target, v))
    assert(ts == ts.sorted && ts.distinct == ts,
      s"same-millisecond restores must still stamp distinct instants: $ts")
    assert(store.versionAtTime(target, store.commitTimeOf(target, v2)) == v2)
    assert(store.versionAtTime(target, store.commitTimeOf(target, v3)) == v3)
    // The restore's instant is its OWN commit time, not v0's/v1's.
    assert(ts(2) > ts(1) && ts(3) > ts(2))
  }

  test("deep history resolves in one sidecar parse: $history / " +
      "versionAtTime over 100 versions match per-version commitTimeOf") {
    val (store, target) = freshStore("ctimedeep")
    val sup = Tables.load(spark, sf, "supplier").limit(10)
    wave(store, target, sup, 1000L)                                    // v0
    wave(store, target, sup.withColumn("s_acctbal",
      col("s_acctbal") + 1.0), 2000L)                                  // v1
    // Pointer-only restores are full commits (manifest + sidecar line)
    // at metadata cost — a 100-deep history in milliseconds. The
    // multi-version resolvers (history/versionAtTime/expireSnapshots)
    // parse commits.jsonl ONCE per call (ADVICE r14: per-version
    // whole-file reads made them O(versions × sidecar)); this pins
    // their results against the per-version single lookups, and the
    // wall-clock stays trivially flat because the walk is linear.
    val deep = (2 to 99).map(v => store.restore(target, v % 2))
    assert(deep.last == 99 && store.currentVersion(target) == 99)
    val hist = store.history(spark, target)
      .orderBy("version").collect()
    assert(hist.length == 100)
    hist.foreach { r =>
      assert(r.getLong(1) == store.commitTimeOf(target, r.getInt(0)),
        s"history instant for v${r.getInt(0)} diverged from commitTimeOf")
    }
    val instants = hist.map(_.getLong(1))
    assert(instants.sameElements(instants.sorted) &&
      instants.distinct.length == 100, "100 strictly monotone instants")
    // Spot resolution across the whole range off the one-parse path.
    Seq(0, 1, 37, 63, 98, 99).foreach { v =>
      assert(store.versionAtTime(target, store.commitTimeOf(target, v)) == v)
    }
  }

  test("vacuum compacts the commits sidecar to surviving winners; " +
      "resolution and the monotone stamp are unchanged") {
    import java.nio.file.{Files, Paths}
    val (store, target) = freshStore("ctimecompact")
    val sup = Tables.load(spark, sf, "supplier").limit(20)
    wave(store, target, sup, 1000L)                                    // v0
    (1 to 5).foreach(i => wave(store, target,
      sup.withColumn("s_acctbal", col("s_acctbal") + i.toDouble),
      1000L + i))                                                      // v1..v5
    // A dropped staged branch leaves a line for a version that never
    // published — growth the compaction must reclaim.
    val staged = store.stageCommit(spark, target,
      store.rawState(spark, target), Seq.empty)
    store.dropStaged(target, staged)
    val sidecar = Paths.get(store.warehouse, target, "commits.jsonl")
    val before = Files.readAllLines(sidecar).size
    assert(before >= 7, s"6 commits + 1 dropped-staged line, got $before")

    store.createRef(target, "pin", 1) // pins v1 through the vacuum
    val keepInstants = Seq(1, 4, 5).map(v => store.commitTimeOf(target, v))
    store.vacuum(target, keepVersions = 2)                 // keeps v4, v5
    val after = Files.readAllLines(sidecar).size
    assert(after == 3,
      s"compacted sidecar holds exactly the surviving versions' lines " +
        s"(v1 ref-pinned, v4, v5), got $after")
    assert(Seq(1, 4, 5).map(v => store.commitTimeOf(target, v))
      == keepInstants, "compaction must not move any surviving instant")
    assert(store.versionAtTime(target, keepInstants(1)) == 4)
    // The monotone stamp still reads the running max off the last line.
    wave(store, target, sup.withColumn("s_acctbal",
      col("s_acctbal") + 99.0), 9000L)                                 // v6
    val ts = Seq(1, 4, 5, 6).map(v => store.commitTimeOf(target, v))
    assert(ts == ts.sorted && ts.distinct == ts,
      s"post-compaction commits stay strictly monotone: $ts")
  }
}
