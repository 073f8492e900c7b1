package graft.queries

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Position-delete MOR (`cdc_merge_mor_position`): the sidecar must
  * address rows by (file, row-ordinal) WITHOUT any key column, each
  * commit's sidecar must be exactly change-volume-sized, an appended
  * file must never be retro-masked by an earlier commit's deletes,
  * the masked read must equal the compacted rewrite row-for-row, and
  * compaction must retire the sidecar entirely.
  */
class PositionMorSpec extends SparkTestBase {

  test("key-free sidecar, change-sized commits, no retro-masking, " +
      "fold equivalence, sidecar retired by compaction") {
    val dir = MorQueries.buildPosMor(spark, sf)
    val base = graft.Tables.load(spark, sf, "customer")
    val n3 = base.filter(col("c_custkey") % 3 === 0).count()
    val n7 = base.filter(col("c_custkey") % 7 === 0).count()

    // The sidecar is pure physical addressing — no key column exists
    // to mask by, which is the flavor's defining property.
    val sidecar = spark.read.parquet(s"$dir/pos-deletes")
    assert(sidecar.columns.sorted.toSeq == Seq("del_file", "del_pos"),
      s"sidecar must be (file, pos) only, got ${sidecar.columns.toSeq}")
    // Change-volume-sized: |k%3| old images masked by the upsert wave
    // plus |k%7| live rows masked by the delete wave (every %7 key has
    // exactly one live row when the delete wave harvests).
    assert(sidecar.count() == n3 + n7,
      s"expected ${n3 + n7} masked addresses")

    // No retro-masking: the upsert wave's appended images (k%3, not
    // k%7) all survive — deletes harvested before the append can never
    // name addresses inside the new file.
    val live = MorQueries.posLive(spark, dir)
    val upserted = live.filter(col("c_custkey") % 3 === 0 &&
      col("c_custkey") % 7 =!= 0)
    val expectUpserted = base.filter(col("c_custkey") % 3 === 0 &&
      col("c_custkey") % 7 =!= 0).count()
    assert(upserted.count() == expectUpserted)
    // ...and they carry the post-upsert image, not the base one.
    val probe = upserted.orderBy("c_custkey").select("c_custkey", "c_acctbal")
      .head()
    val baseBal = base.filter(col("c_custkey") === probe.getLong(0))
      .select("c_acctbal").head().getDouble(0)
    assert(math.abs(probe.getDouble(1) - (baseBal + 100.0)) < 1e-9)

    // Scale shape: the change-volume-sized sidecar broadcasts into the
    // anti join (Iceberg's reader does the same per file group) — the
    // big data side never shuffles for the mask.
    live.collect()
    val planStr = live.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin") &&
      planStr.contains("LeftAnti"),
      s"sidecar mask must be a broadcast anti join:\n${planStr.take(600)}")

    // Fold equivalence: the masked read and the compacted rewrite are
    // the same logical table, row for row.
    val morRows = live.select("c_custkey", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    MorQueries.posCompact(spark, dir)
    assert(!Files.exists(Paths.get(dir, "pos-deletes")),
      "compaction must retire the position-delete sidecar")
    val compacted = spark.read.parquet(s"$dir/data")
      .select("c_custkey", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(compacted == morRows, "compacted rewrite must equal the MOR read")

    // A post-compaction posLive (no sidecar) is the identity read.
    assert(MorQueries.posLive(spark, dir).count() == morRows.size)
  }
}
