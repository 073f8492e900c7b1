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

  test("the merged state publishes DECIMAL(18,2) across the boundary") {
    val out = graft.queries.CdcQueries.decimalWidening(spark, sf)
    assert(out.schema("c_acctbal").dataType === DecimalType(18, 2),
      "phase-1 DECIMAL(12,2) state must surface widened to (18,2)")
    val n = out.count()
    val base = graft.Tables.load(spark, sf, "customer").count()
    assert(n === base, "no phase has deletes; every key survives")
  }
}
