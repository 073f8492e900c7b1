package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental MinHash-LSH signature maintenance under CDC
  * (MinhashCdcQueries): the signature table must converge to the
  * batch recompute over the final corpus, independent of micro-batch
  * slicing, with deletes tombstoned and stale events losing the
  * ordered merge.
  */
class MinhashCdcSpec extends SparkTestBase {

  test("signature state is independent of micro-batch slicing") {
    // A signature is a pure function of the doc's LATEST text and the
    // ordered merge picks the same winner under any slicing — the
    // stale/snapshot/edit/delete waves interleave differently when the
    // 4 staged files drain as 4 micro-batches vs 1.
    def run(filesPerTrigger: Int) =
      MinhashCdcQueries.minhashIncremental(spark, sf, filesPerTrigger)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val oneAtATime = run(1)
    val allAtOnce = run(4)
    assert(oneAtATime.nonEmpty)
    assert(oneAtATime === allAtOnce)
  }

  test("deletes drop signatures; edits change them; stale wave loses") {
    val sigs = MinhashCdcQueries.minhashIncremental(spark, sf)
    val docs = graft.Tables.load(spark, sf, "documents")
    val n = docs.count()
    val nDeleted = docs.filter(col("doc_id") % 7 === 0).count()
    assert(sigs.select("doc_id").distinct().count() === n - nDeleted,
      "every surviving doc has a signature; every deleted doc has none")
    assert(sigs.groupBy("doc_id").count()
      .filter(col("count") =!= 4).count() === 0, "4 bands per doc")
    // The stale wave (%2, ts=500) rewrote text to a constant — if it
    // had won the merge, every surviving even doc would share one
    // signature. Prove the merge discarded it: even-doc signatures are
    // as diverse as the corpus.
    val evenDistinct = sigs.filter(col("doc_id") % 2 === 0)
      .filter(col("band") === 0)
      .select("mh").distinct().count()
    assert(evenDistinct > 1, "stale boilerplate must lose the merge")
  }
}
