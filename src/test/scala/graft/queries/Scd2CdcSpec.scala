package graft.queries

import graft.SparkTestBase

/** Incremental SCD2 contracts: the maintained history must equal the
  * batch derivation exactly, for every micro-batch slicing of the
  * interleaved log. The log stages waves OUT of commit order
  * (ChangeGen.scala:72-73) and `repartition(4)` scatters them across
  * staged files, so draining one file at a time delivers genuinely
  * late events — earlier-ts events arriving after later-ts intervals
  * are already committed — and the splice must still converge.
  */
class Scd2CdcSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSeq

  test("incrementally maintained history equals the batch SCD2 for " +
      "every slicing, including one-file-at-a-time late arrival") {
    val batch = rows(MaintenanceQueries.scd2(spark, sf))
    assert(batch.nonEmpty)
    val lateArrival = rows(Scd2CdcQueries.scd2Incremental(spark, sf, 1))
    val allAtOnce = rows(Scd2CdcQueries.scd2Incremental(spark, sf, 4))
    assert(lateArrival === batch,
      "late-event splicing diverged from the batch derivation")
    assert(allAtOnce === batch,
      "single-batch drain diverged from the batch derivation")
  }
}
