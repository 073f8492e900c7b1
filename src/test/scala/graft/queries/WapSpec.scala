package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Write-audit-publish contracts beyond the oracle (which checks only
  * the reader-visible published state): the quarantine sidecar must
  * hold exactly the poisoned rows tagged with the first rule they
  * broke, the published table must be audit-clean, and a
  * majority-poisoned wave must ABORT without touching base.
  */
class WapSpec extends SparkTestBase {

  test("quarantine holds exactly the poisoned rows, tagged per rule") {
    MaintenanceQueries.wapPublish(spark, sf).collect()
    val q = spark.read
      .parquet(s"${MaintenanceQueries.wapRoot(sf)}/quarantine")
      .select(col("c_custkey"), col("violation"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val staged = Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .filter(_ % 4 == 0)
    val expected = staged.flatMap { k =>
      if (k % 40 == 0) Some(k -> "null_name") // first-matching rule wins
      else if (k % 25 == 0) Some(k -> "balance_bound")
      else None
    }.toMap
    assert(q == expected, s"quarantine mismatch: got ${q.size} rows")
    assert(q.valuesIterator.toSet == Set("null_name", "balance_bound"))
  }

  test("published state is audit-clean") {
    val pub = MaintenanceQueries.wapPublish(spark, sf)
    assert(pub.filter(col("c_name").isNull ||
      col("c_acctbal") < -1000.0).count() == 0)
  }

  test("majority-poisoned wave aborts and leaves base untouched") {
    val dir = graft.Scratch.dir("graft-wap-spec-").toString
    val base = Tables.load(spark, sf, "customer")
    val wave = base.filter(col("c_custkey") % 4 === 0)
      .withColumn("c_name", lit(null).cast("string")) // 100% violating
    val ex = intercept[IllegalArgumentException] {
      MaintenanceQueries.wapRun(spark, dir, base, wave)
    }
    assert(ex.getMessage.contains("WAP abort"))
    // Base is intact and no published output exists.
    assert(spark.read.parquet(s"$dir/base").count() == base.count())
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "published")))
  }
}
