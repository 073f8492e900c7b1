package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** The decimal corner of the A11 widening lattice: precision growth at
  * equal scale is the ONLY permitted decimal promotion (it re-encodes
  * exactly); every rescaling or decimal↔float mix must fail loudly —
  * silent rescale-rounding is data corruption, not evolution.
  */
class DecimalWideningSpec extends SparkTestBase {

  test("equal-scale precision growth widens; everything else throws") {
    assert(SchemaEvolution.widen(DecimalType(12, 2), DecimalType(18, 2)) ===
      DecimalType(18, 2))
    assert(SchemaEvolution.widen(DecimalType(18, 2), DecimalType(12, 2)) ===
      DecimalType(18, 2))
    assert(SchemaEvolution.widen(DecimalType(10, 4), DecimalType(10, 4)) ===
      DecimalType(10, 4))
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(DecimalType(12, 2), DecimalType(12, 4))
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(DecimalType(12, 2), DoubleType)
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(DecimalType(12, 2), LongType)
    }
  }

  test("decimal update deltas are decimal-exact — no double intermediate") {
    // ChangeGen.plusDelta must add the +100/+200 waves in the mutable
    // column's OWN decimal type: decimal+decimal is exact, so an image
    // for a value like 0.01 (not representable in binary floating
    // point) comes back as precisely base+delta at scale 2. A double
    // round-trip would still usually round back correctly — this test
    // pins the TYPE of the arithmetic, which is what keeps the engine
    // and the DuckDB oracle split-proof (round-9 hash flake).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((3L, "0.01"), (6L, "999999999.99"), (9L, "123.45"))
      .toDF("k", "v")
      .withColumn("v", col("v").cast(DecimalType(12, 2)))
    val log = ChangeGen.changeLog(base, "k", "v", "s", "t")
    val u1 = log.filter(col("op") === "u" && col("ts_ms") === 2000L)
      .select(col("after.k"), col("after.v")).collect()
    assert(u1.length === 3)
    val got = u1.map(r => r.getLong(0) ->
      r.getDecimal(1).stripTrailingZeros.toPlainString).toMap
    assert(got === Map(3L -> "100.01", 6L -> "1000000099.99",
      9L -> "223.45"))
    val vType = log.schema("after").dataType
      .asInstanceOf[StructType]("v").dataType
    assert(vType === DecimalType(12, 2),
      "the image keeps the column's own decimal type end to end")
  }

  test("the merged state publishes DECIMAL(18,2) across the boundary") {
    val out = graft.queries.CdcQueries.decimalWideningState(spark, sf)
    assert(out.schema("c_acctbal").dataType === DecimalType(18, 2),
      "phase-1 DECIMAL(12,2) state must surface widened to (18,2)")
    val n = out.count()
    val base = graft.Tables.load(spark, sf, "customer").count()
    assert(n === base, "no phase has deletes; every key survives")
  }

  test("harness projection is exact BIGINT cents of the decimal state") {
    // The registered query republishes the scale-2 decimal as integer
    // cents (the only DECIMAL-typed harness output hash-mismatched in
    // the driver's compare while every local discipline passed). Pin
    // the projection's type AND its exactness against the state.
    // Materialize each side before building the other: both calls
    // rebuild the same cached temp state dir, so a lazy frame from
    // the first call would read files the second call replaced.
    val q = graft.queries.CdcQueries.decimalWidening(spark, sf)
    assert(q.schema("acctbal_cents").dataType === LongType)
    val cents = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drift = graft.queries.CdcQueries.decimalWideningState(spark, sf)
      .collect().count { r =>
        r.getDecimal(1).movePointRight(2).longValueExact !=
          cents(r.getLong(0))
      }
    assert(drift === 0, "cents must equal the decimal state exactly")
  }
}
