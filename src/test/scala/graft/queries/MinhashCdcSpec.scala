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

  test("incremental curation is independent of micro-batch slicing " +
      "and excludes every deleted doc") {
    def run(filesPerTrigger: Int) =
      MinhashCdcQueries.curateIncremental(spark, sf, filesPerTrigger)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val oneAtATime = run(1)
    val allAtOnce = run(4)
    assert(oneAtATime.nonEmpty)
    assert(oneAtATime === allAtOnce,
      "the curated set must converge under any micro-batch slicing")
    assert(oneAtATime.keys.forall(_ % 7 != 0),
      "no deleted doc may survive curation")
    // Edited docs (%3) gained 6 repeated words: any %3 doc that still
    // qualifies carries the edit's word count, proving the curation
    // read the POST-EDIT state, not the snapshot.
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n0"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edited = oneAtATime.filter { case (k, _) => k % 3 == 0 }
    assert(edited.nonEmpty && edited.forall { case (k, n) =>
      n == docs(k) + 6
    }, "curated %3 docs must carry the edited text's word count")
  }
}
