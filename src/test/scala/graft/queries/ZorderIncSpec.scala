package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental z-order maintenance
  * ([[MaintenanceQueries.layoutZorderIncremental]]'s stage functions):
  * the audit localizes degradation to exactly the waved groups, the
  * re-cluster touches ONLY those groups — every untouched group's
  * files carry over BYTE-IDENTICAL — and the rewrite genuinely
  * recovers span tightness (the degraded groups' average per-leaf
  * qy span shrinks).
  */
class ZorderIncSpec extends SparkTestBase {

  /** md5 of every data file under the group dir, keyed by relative
    * path — the byte-identity instrument.
    */
  private def groupChecksums(laid: String, zb: Int): Map[String, String] = {
    val root = Paths.get(laid, s"zb=$zb")
    val digest = (p: Path) => MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString
    val files = Files.walk(root).filter(Files.isRegularFile(_))
      .filter(p => !p.getFileName.toString.startsWith("_"))
      .toArray.map(_.asInstanceOf[Path])
    files.map(p => root.relativize(p).toString -> digest(p)).toMap
  }

  test("audit localizes to the waved groups; rewrite leaves untouched " +
      "groups byte-identical and shrinks the degraded spans") {
    val wh = graft.Scratch.dir("graft-zi-spec-").toString
    val laid = s"$wh/lineitem_z"
    val b = MaintenanceQueries.ziBounds(spark, sf)
    MaintenanceQueries.ziBuild(spark, sf, laid, b)
    MaintenanceQueries.ziWave(spark, laid, b)

    val audit = MaintenanceQueries.ziAudit(spark, laid, b).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val degraded = audit.filter(_._2._2 > 0L).keys.toSeq.sorted
    assert(degraded == Seq(3, 7),
      s"the wave touched groups 3 and 7 only, audit saw $degraded")
    assert(audit(3)._2 > 0 && audit(7)._2 > 0)

    // Degraded spans BEFORE the rewrite (stale leaf assignment).
    def avgQySpan(zbs: Seq[Int]): Double = {
      val df = spark.read.parquet(laid).filter(col("zb").isin(zbs: _*))
      val withZ = df
        .withColumn("qy", floor((col("l_suppkey") - lit(b.skLo)) *
          lit(256.0) / lit(b.skHi - b.skLo + 1L)).cast("long"))
      withZ.groupBy("zb", "zf")
        .agg((max("qy") - min("qy")).as("s"))
        .agg(avg("s")).head.getDouble(0)
    }
    val beforeSpan = avgQySpan(degraded)

    val untouched = audit.keys.toSeq.filterNot(degraded.contains).sorted
    val checksumsBefore = untouched.map(z => z -> groupChecksums(laid, z))

    MaintenanceQueries.ziRewrite(spark, laid, b, degraded)

    checksumsBefore.foreach { case (z, cs) =>
      assert(groupChecksums(laid, z) == cs,
        s"untouched group zb=$z must carry over byte-identical")
    }
    degraded.foreach { z =>
      assert(groupChecksums(laid, z).nonEmpty, s"zb=$z rewritten")
    }
    val afterSpan = avgQySpan(degraded)
    assert(afterSpan < beforeSpan,
      s"re-cluster must tighten the degraded groups' average leaf qy " +
        s"span: before $beforeSpan, after $afterSpan")
    // Row preservation: the rewrite moves no rows across groups.
    val counts = spark.read.parquet(laid).groupBy("zb").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    audit.foreach { case (z, (n, _)) => assert(counts(z) == n) }
  }
}
