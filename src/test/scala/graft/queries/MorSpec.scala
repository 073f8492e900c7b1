package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Merge-on-read contracts: the masked read must equal the
  * copy-on-write answer, the sidecars must stay change-volume-sized
  * (the write-amplification claim), and compaction must fold to an
  * equivalent base with the sidecars gone.
  */
class MorSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
      r.getDouble(3), r.getString(4))).toSeq

  test("MOR read equals the copy-on-write merge of the same waves") {
    val got = rows(MaintenanceQueries.mergeMor(spark, sf))
    val base = Tables.load(spark, sf, "customer")
    val pk = col("c_custkey")
    val expected = rows(base
      .withColumn("c_acctbal", round(col("c_acctbal") +
        when(pk % 5 === 0, 200.0)
          .when(pk % 3 === 0, 100.0).otherwise(0.0), 2))
      .filter(pk % 7 =!= 0)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .orderBy("c_custkey"))
    assert(got.nonEmpty && got === expected)
  }

  test("sidecars are change-sized, the base is append-only, and " +
      "compaction folds to an equivalent base") {
    val dir = MaintenanceQueries.buildMor(spark, sf)
    val base = Tables.load(spark, sf, "customer")
    val pk = col("c_custkey")
    val n3 = base.filter(pk % 3 === 0).count()
    val n5 = base.filter(pk % 5 === 0).count()
    val n7 = base.filter(pk % 7 === 0).count()

    // Write cost of the three waves is the change volume, not the
    // table: delta carries the two update waves' images, the delete
    // sidecar one key per masked row — while the base still holds the
    // untouched full snapshot.
    assert(spark.read.parquet(s"$dir/delta").count() === n3 + n5)
    assert(spark.read.parquet(s"$dir/deletes").count() === n3 + n5 + n7)
    assert(spark.read.parquet(s"$dir/base").count() === base.count())

    val before = rows(MaintenanceQueries.morRead(spark, dir))
    MaintenanceQueries.morCompact(spark, dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "delta")), "compaction drops deltas")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "deletes")), "compaction drops deletes")
    val after = rows(MaintenanceQueries.morRead(spark, dir))
    assert(after === before, "compaction must not change the table")
  }
}
