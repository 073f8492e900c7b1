package graft.queries

import graft.SparkTestBase
import graft.ops.ClusterOps

/** Incremental PQ code maintenance: codes are a pure function of the
  * merged per-key state given snapshot codebooks, so the drained state
  * must be identical under any micro-batch slicing, and the delete
  * wave's keys must vanish from the codes table.
  */
class PqCdcSpec extends SparkTestBase {

  test("codes state is independent of micro-batch slicing") {
    def run(filesPerTrigger: Int) =
      PqCdcQueries.pqIncremental(spark, sf, filesPerTrigger).collect()
        .map(r => r.getLong(0) ->
          (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toMap
    val oneAtATime = run(1)
    val allAtOnce = run(4)
    assert(oneAtATime.nonEmpty)
    assert(oneAtATime === allAtOnce,
      "per-key codes must not depend on how the log slices into batches")
  }

  test("tombstoned keys leave the codes table; survivors carry valid codes") {
    val rows = PqCdcQueries.pqIncremental(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 7 != 0L),
      "every %7 key was deleted by the last wave and must not re-appear")
    val ks = rows.flatMap(r => Seq(r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4)))
    assert(ks.forall(k => k >= 0 && k < 8),
      s"codes must index the ${ClusterOps.PqM} 8-codeword codebooks")
  }
}
