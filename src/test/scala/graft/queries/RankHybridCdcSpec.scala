package graft.queries

import graft.SparkTestBase

/** The CDC-served hybrid ([[RankHybridCdcQueries]]): the fused
  * ranking is independent of how the change logs were sliced into
  * micro-batches (both maintainers' telescoping-state argument,
  * composed), and the recall audit is internally consistent.
  */
class RankHybridCdcSpec extends SparkTestBase {

  test("served hybrid is independent of micro-batch slicing") {
    val r1 = RankHybridCdcQueries.rankHybridCdc(spark, sf, 1)
      .collect().map(_.toSeq.toList).toList
    assert(r1.nonEmpty && r1.size <= 10)
    val r4 = RankHybridCdcQueries.rankHybridCdc(spark, sf, 4)
      .collect().map(_.toSeq.toList).toList
    assert(r4 == r1,
      "maintained-state serve must not depend on drain slicing")
  }

  test("recall audit: k=10, hits within range, recall = hits/k") {
    val row = RankHybridCdcQueries.rankHybridCdcRecall(spark, sf)
      .head()
    assert(row.getInt(0) == 10)
    val hits = row.getLong(1)
    assert(hits >= 0L && hits <= 10L)
    assert(math.abs(row.getDouble(2) - hits / 10.0) < 1e-9)
  }
}
