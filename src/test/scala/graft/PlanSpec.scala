package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the scale-critical plan properties
  * (filter pushdown, column pruning, broadcast dims, top-k without a
  * global sort, partial aggregation) are asserted here so a refactor
  * that silently degrades a plan fails CI, not the 100 TB run.
  */
class PlanSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution
      .explainString(FormattedMode)

  /** Scan nodes in a formatted plan (counted via the numbered detail
    * headers — each node prints twice: tree line + detail section).
    */
  private def scanCount(p: String): Int =
    "\\(\\d+\\) Scan parquet".r.findAllIn(p).size

  test("llm_mix_importance_topk: no global-order window — the cut is " +
    "bucket-partitioned, never an Exchange SinglePartition") {
    val p = plan("llm_mix_importance_topk")
    assert(p.contains("Window"), "boundary-bucket cut must be a window")
    assert(!p.contains("Exchange SinglePartition"),
      "a global-order window would serialize the corpus through one " +
        "partition — the shape the histogram threshold exists to avoid")
  }

  test("llm_shuffle_epoch: the range sort is the ONLY exchange — the " +
    "shuffle being computed, nothing else moves") {
    val p = plan("llm_shuffle_epoch")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges")
    assert(p.contains("Arguments: rangepartitioning"),
      "the one exchange must be the range sort, not a hash or " +
        "single-partition collapse")
  }

  test("llm_quality_repetition: bigrams are scan-local — no Window, " +
    "and every aggregate is partial+final") {
    val p = plan("llm_quality_repetition")
    assert(!p.contains("Window"),
      "bigram construction must be the zip_with projection, not the " +
        "oracle's lead() window — a window would sort every document's " +
        "tokens through a per-doc shuffle before the first aggregate")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "the (doc,bigram), per-doc, and per-source rollups must all " +
        "partial-aggregate map-side")
  }

  test("llm_rank_bm25: two scans only, scan-local tf (no explode), " +
    "1-row stats broadcast, TakeOrderedAndProject cut") {
    val p = plan("llm_rank_bm25")
    assert(scanCount(p) == 2,
      "pass 1 (corpus stats) + pass 2 (score) — a third scan means tf " +
        "or dl grew a join back to the corpus")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-20 cut must never be a global Sort+Exchange")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      "nothing data-sized may shuffle: tf is scan-local, the score is " +
        "a per-row closed form against broadcast stats")
    assert(p.contains("BroadcastExchange"),
      "the 1-row stats must reach the scorer as a broadcast")
    assert(!p.contains("Generate"),
      "tf must be the filter() higher-order function, not explode — " +
        "explode would multiply the scan by tokens-per-doc and force a " +
        "per-(doc,term) aggregate")
  }

  test("llm_pii_scrub: one scan, everything scan-local (no Generate, " +
    "no Window), only the 20-key rollup shuffles") {
    val p = plan("llm_pii_scrub")
    assert(scanCount(p) == 1,
      "detect + redact + checksum are all projections over ONE pass")
    assert(!p.contains("Generate"),
      "hit counting must be regexp_extract_all size, never an explode")
    assert(!p.contains("Window"), "no window anywhere in a scrub pass")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the source rollup must partial-aggregate map-side")
  }

  test("llm_dedup_lines: census+rewrite reuse one base scan path, the " +
    "frequent set comes back as a broadcast, no global-order window") {
    val p = plan("llm_dedup_lines")
    assert(p.contains("BroadcastExchange"),
      "the boilerplate set must join back broadcast — hash-joining it " +
        "would shuffle every line of the corpus a second time")
    assert(!p.contains("Window"),
      "reassembly must be sort_array inside the aggregate, not a " +
        "per-doc ordering window")
    assert(!p.contains("Exchange SinglePartition"),
      "nothing in the census or the rewrite may collapse to one " +
        "partition — the corpus-wide threshold is a hash aggregate")
  }

  test("agg_q1: filter pushed to scan, pruned columns, partial+final agg") {
    val p = plan("agg_q1")
    assert(p.contains("PushedFilters"), "no pushdown block")
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    assert(!p.contains("l_orderkey"), "unused columns not pruned from scan")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("join_broadcast: dims broadcast, no sort-merge join") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "fact side must not sort-merge for dims")
  }

  test("sort_topk: TakeOrderedAndProject, no global Sort+Exchange") {
    val p = plan("sort_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("llm_chunk_dedup: digests-only shuffle — boilerplate set " +
      "broadcast into a semi join, rollups partial-aggregated") {
    val p = plan("llm_chunk_dedup")
    assert(p.contains("LeftSemi"), "boilerplate filter must be a semi join")
    assert(p.contains("BroadcastExchange"),
      "the offending-digest set must broadcast at fixture scale")
    assert(!p.contains("SortMergeJoin"),
      "no join in this plan should need a sort-merge at fixture scale")
    assert(!p.contains("text#") || !p.contains("Exchange hashpartitioning(text"),
      "chunk text must never be a shuffle key — digests only")
  }

  test("llm_sim_ivfpq: probed lists only — broadcast joins, " +
      "take-ordered funnel, no global sort before the cut") {
    val p = plan("llm_sim_ivfpq")
    assert(p.contains("TakeOrderedAndProject"),
      "the ADC top-C cut must be TakeOrdered, not a global sort")
    assert(!p.contains("SortMergeJoin"),
      "candidate re-rank joins must broadcast")
  }

  test("dsq_rollup_join: rollup Expand sits above the join, dims " +
      "broadcast, both grouping levels partial-aggregate") {
    val p = plan("dsq_rollup_join")
    assert(p.contains("Expand"), "rollup must plan an Expand")
    assert(p.contains("BroadcastHashJoin"), "customer/nation must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "rollup must partial-aggregate before the shuffle")
    // The Expand triples rows AFTER the join keys are computed — it
    // must consume the join output, not a scan (scan count stays 4).
    assert(scanCount(p) === 4, s"expected 4 scans, got ${scanCount(p)}")
  }

  test("dsq_rank_bands: date window pushed to the orders scan; the " +
      "rank window runs over the aggregated bands, not fact rows") {
    val p = plan("dsq_rank_bands")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_orderdate"),
      "the 1996 window must reach the scan")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "monthly rollup must partial-aggregate")
    // Window input is the (month × nation) aggregate: in the formatted
    // plan the Window node's child chain must contain the aggregate,
    // which it does iff Window appears and no second fact scan feeds it.
    assert(p.contains("Window"), "rank must be a window, not a self-join")
    assert(scanCount(p) === 3, s"expected 3 scans, got ${scanCount(p)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dsq_yoy: lag window over the yearly aggregate — no self-join") {
    val p = plan("dsq_yoy")
    assert(p.contains("Window"), "YoY must be a lag window")
    assert(scanCount(p) === 3,
      s"a self-join rewrite would re-scan: got ${scanCount(p)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("llm_sim_graph: per-hop equi-joins over beam + edges, no " +
      "nested loop beyond the 1-row probe broadcast") {
    val p = plan("llm_sim_graph")
    // Every hop = beam ⋈ edges + candidates ⋈ scored — all equi-joins
    // (hash by vec_id); a nested-loop hop would be O(corpus) per step.
    assert(!p.contains("CartesianProduct"),
      "graph walk must never cross-join")
    // The only permissible non-equi join is the 1-row probe vector
    // broadcast (the simTopk precedent). Count them: hops reuse the
    // same scored/edge lineage, so the probe appears a bounded number
    // of times, but NO hop may introduce its own data-sized loop —
    // every BroadcastNestedLoopJoin in this plan must be against the
    // 1-row probe, whose build side is a single-row aggregate-free
    // projection (it prints as a broadcast of the vec_id=0 filter).
    // Distinct node ids: the formatted plan prints each node in both
    // the tree and the detail section.
    val bnl = "\\((\\d+)\\) BroadcastNestedLoopJoin".r.findAllMatchIn(p)
      .map(_.group(1)).toSet.size
    val probes = "PushedFilters: \\[IsNotNull\\(vec_id\\), EqualTo\\(vec_id,0\\)\\]".r
      .findAllIn(p).size
    assert(bnl <= probes,
      s"$bnl nested-loop joins but only $probes 1-row probe scans — " +
        "a hop degenerated to a nested loop")
    // Beam cuts are TakeOrdered, not global sorts.
    assert(p.contains("TakeOrderedAndProject"),
      "beam cut must be TakeOrdered")
  }

  test("llm_chunk_overlap: map-only chunking — pruned scan, one " +
      "exchange (the result sort), no aggregation or join") {
    val p = plan("llm_chunk_overlap")
    assert(scanCount(p) === 1)
    assert(!p.contains("lang") && !p.contains("n_chars"),
      "chunking must prune to (doc_id, text)")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
      "the only exchange allowed is the deterministic result sort")
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      "chunking must stay generate+project only")
  }

  test("filter_predicates: BETWEEN/LIKE/IN all pushed") {
    val p = plan("filter_predicates")
    assert(p.contains("GreaterThanOrEqual(o_totalprice"), "BETWEEN lower not pushed")
    assert(p.contains("StringStartsWith(o_orderpriority"), "LIKE prefix not pushed")
    assert(p.contains("In(o_orderstatus"), "IN not pushed")
  }

  test("llm_sim_topk: 1-row probe broadcast + top-k operator") {
    val p = plan("llm_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "probe must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("join_dpp: fact scan carries a dynamicpruning partition filter") {
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruning"),
      "the fact side must prune partitions from the dim's runtime filter")
    assert(p.contains("PartitionFilters"),
      "the prune must be a PARTITION filter, not a row filter")
  }

  test("agg_pushdown: the registered query returns the footer-stat row") {
    // The full PushedAggregation plan assertion lives in
    // AggPushdownSpec (the conf window must be open to see it); here
    // just pin the checkpointed result shape.
    val r = SparkEntry.queries("agg_pushdown")(spark, sf).collect()
    assert(r.length === 1 && r(0).getLong(0) > 0)
  }

  test("llm_sim_hnsw: hop lineage is CUT — the final plan reads the " +
      "checkpointed beam, not a 2^hops re-execution tree") {
    // The beam is referenced twice per hop, so a lazy recursion
    // re-executes each earlier hop 2^depth times (measured 20 s at
    // sf0.1 before the eager per-hop localCheckpoint, ~4 s after).
    // The property to pin is therefore the TRUNCATION: the returned
    // plan must start from the checkpointed 10-row beam (an RDD scan),
    // with no join, no parquet scan, and no beam re-derivation left
    // above it — those all ran eagerly during construction.
    val p = plan("llm_sim_hnsw")
    assert(p.contains("Scan ExistingRDD"),
      "final plan must read the checkpointed beam")
    assert(scanCount(p) === 0, "no parquet re-scan above the checkpoint")
    assert(!p.contains("Join"), "no join re-derivation above the checkpoint")
    assert(!p.contains("CartesianProduct"), "never a cross-join")
  }

  test("llm_sim_filtered: pre-filter strategy prunes at the SCAN, " +
      "before any distance math") {
    val p = plan("llm_sim_filtered")
    // The whole point of the pre-filter path: the metadata predicate
    // reaches the parquet reader, so at 100 TB only the predicate's
    // row groups are read — the cosine never sees a filtered-out row.
    assert(p.contains("EqualTo(label,3)"),
      "label equality must land in PushedFilters")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(!p.contains("CartesianProduct"), "only the 1-row probe may loop")
  }

  test("llm_sim_filtered strategies: census picks pre_filter at 2% " +
      "selectivity and post_filter at 50%") {
    import org.apache.spark.sql.functions.col
    val pre = SparkEntry.queries("llm_sim_filtered")(spark, sf)
      .select("strategy").distinct().collect().map(_.getString(0)).toSet
    assert(pre === Set("pre_filter"),
      "selective predicate must take the exact pre-filter path")
    val post = SparkEntry.queries("llm_sim_filtered_post")(spark, sf)
      .select("strategy").distinct().collect().map(_.getString(0)).toSet
    assert(post === Set("post_filter"),
      "broad predicate must take the index-probe + post-filter path")
    // The post-filter output actually honors the predicate.
    val odd = SparkEntry.queries("llm_sim_filtered_post")(spark, sf)
      .filter(col("vec_id") % 2 === 0).count()
    assert(odd === 0, "post-filter must remove even vec_ids")
  }

  test("llm_sim_centroids: 64 agg buffers in one groupBy, no pre-agg explode") {
    val p = plan("llm_sim_centroids")
    // The centroid build must NOT posexplode N rows into N·64 before
    // aggregating (64× shuffle inflation at 100 TB): one partial+final
    // HashAggregate pair over 64 avg buffers; the only Generate allowed
    // is the tiny post-agg posexplode of nlist centroid rows.
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "centroids must partial-aggregate")
    val genIdx = p.indexOf("Generate")
    val aggIdx = p.indexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx >= 0, s"expected Generate + HashAggregate:\n$p")
    // Formatted plans list operators leaf-last; the explode node must
    // sit ABOVE (before, in print order) the aggregates, i.e. run after.
    assert(genIdx < aggIdx,
      "posexplode must run on aggregated centroids, not raw embeddings")
  }

  test("llm_text_rollhash/tokens: scan-local projections, no shuffle") {
    for (q <- Seq("llm_text_rollhash", "llm_text_tokens")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle — it is a pure projection")
    }
  }

  test("cdc merge compaction partial-aggregates before the shuffle, no window") {
    val p = plan("cdc_merge_customer")
    // max_by(struct, struct) buffers a struct, so Spark picks
    // SortAggregate over HashAggregate — fine. The load-bearing
    // invariants: TWO aggregate stages (map-side partial combine means
    // one pre-combined row per key per partition crosses the shuffle)
    // and NO window operator (a row_number window would shuffle every
    // event and sort whole partitions).
    assert("(Sort|Hash|ObjectHash)Aggregate".r.findAllIn(p).size >= 2,
      "compaction must partial-aggregate before the exchange")
    assert(!p.contains("Window"), "compaction must not use a window operator")
  }

  test("llm_curate: join-based dedup stages, no cartesian, no window") {
    val p = plan("llm_curate")
    // The exact-dedup keeper set joins back semi/anti — hash joins on
    // the id, never a cartesian product; the LSH stage's only joins are
    // on the (band, minhash) bucket key. A window (row_number-per-
    // digest) would shuffle and sort whole text partitions instead.
    assert(p.contains("LeftSemi"), "keeper set must semi-join back")
    assert(p.contains("LeftAnti"), "near-dup drop must be an anti join")
    assert(!p.contains("CartesianProduct"), "curate must never cross-join")
    assert(!p.contains("Window"), "dedup must stay join-based, not window")
  }

  test("stream_curate_near collision check: broadcast EQUI-join, " +
    "never a nested-loop array probe") {
    // Batch twin of the streaming near-dup join (same expressions,
    // static src): the history index must arrive as a broadcast hash
    // join on (band, mh). The tempting alternative — keeping the
    // signature in-row and probing the history with an array-overlap
    // condition — plans a BroadcastNestedLoopJoin, O(docs × index),
    // which is the scale failure this guard exists to catch.
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        posexplode(graft.functions.BandedMinHash.bandedMinhash(
          graft.functions.ShingleSet.shingleSet(split(col("text"), " "))))
          .as(Seq("band", "mh")))
    val hist = sigs(docs.filter(col("doc_id") % 4 === 0))
      .select("band", "mh").distinct().withColumn("hit", lit(1))
    val joined = sigs(docs)
      .join(broadcast(hist), Seq("band", "mh"), "left")
      .groupBy("doc_id").agg(max(coalesce(col("hit"), lit(0))).as("any_hit"))
    val p = joined.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      "history index must broadcast-equi-join on (band, mh)")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "collision check must never plan a nested-loop probe")
    assert(!p.contains("SortMergeJoin"),
      "tiny band-minima index must not force a sort-merge shuffle")
  }

  test("llm_split_stratified: offset frame broadcasts; the data-sized " +
      "window shuffles by (lang, shard), never one partition per stratum") {
    val p = plan("llm_split_stratified")
    assert(p.contains("BroadcastHashJoin"),
      "shard-offset frame must broadcast back onto the docs")
    assert(!p.contains("SortMergeJoin"),
      "tiny offset frame must not force a sort-merge shuffle")
    // The doc-sized exchange must carry the shard in its key — a
    // lang-only partitioning would be the single-partition-per-stratum
    // window this operator exists to avoid.
    assert("hashpartitioning\\(lang#\\d+, shard#\\d+".r.findFirstIn(p).isDefined,
      "doc window must partition by (lang, shard)")
  }

  test("cdc_scd2_asof: interval predicate rides the key equi-join — " +
      "never a range cross-product") {
    val p = plan("cdc_scd2_asof")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      "temporal join must hash/merge on the key")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "interval matching must not plan a cross-product")
  }

  test("cdc_table_changes: v1 key set broadcasts; latest-per-key " +
      "partial-aggregates map-side") {
    val p = plan("cdc_table_changes")
    assert(p.contains("BroadcastHashJoin"),
      "v1 key set must broadcast onto the change window")
    assert(p.contains("partial_max_by"),
      "latest-per-key must partial-aggregate before the shuffle")
  }

  test("join_q5: date window pushed to the orders scan, dims broadcast, " +
      "no cartesian") {
    val p = plan("join_q5")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date window must reach the orders scan's PushedFilters")
    assert(p.contains("LessThan(o_orderdate"),
      "date window upper bound must be pushed too")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "nation/region/supplier dims must broadcast")
    assert(!p.contains("CartesianProduct"),
      "the 6-table join must never degrade to a cross-product")
  }

  test("join_bloom: bloom probe filters the fact scan BEFORE the " +
      "shuffle, join stays sort-merge") {
    val p = plan("join_bloom")
    assert(p.contains("might_contain"),
      "bloom probe must appear as a filter in the fact branch")
    assert(p.contains("SortMergeJoin"),
      "the scenario pins the non-broadcast join the filter exists for")
    // The probe must sit below the exchange: the filter's whole point
    // is cutting shuffle input, not post-shuffle cleanup.
    val probeAt = p.indexOf("might_contain")
    val smjAt = p.indexOf("SortMergeJoin")
    assert(probeAt > smjAt,
      "bloom filter must be in the scan-side subtree under the join")
  }

  test("llm_decontaminate_bloom: scan-local bloom screen feeds a semi " +
      "join — the probe sits below the verify join") {
    val p = plan("llm_decontaminate_bloom")
    assert(p.contains("might_contain"),
      "bloom screen must appear as a filter over the shingle stream")
    assert(p.contains("LeftSemi"),
      "exact verification must stay a semi join (hits counted, " +
        "eval rows never widened in)")
    val probeAt = p.indexOf("might_contain")
    val semiAt = p.indexOf("LeftSemi")
    assert(probeAt > semiAt,
      "the bloom screen must sit in the subtree BELOW the verify " +
        "join — its point is cutting the join input")
  }

  test("cdc_merge_mor: the delete mask is a broadcast join over the " +
      "scan — never a shuffle of the base") {
    val p = plan("cdc_merge_mor")
    assert(p.contains("BroadcastHashJoin"),
      "the change-volume-sized delete aggregate must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "masking must not sort-merge the base file set")
  }

  test("profile_histogram: bucket counts partial-aggregate before the " +
      "shuffle; bounds ride as literals, not a join") {
    val p = plan("profile_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-(column,bucket) counts must map-side combine")
    assert(!p.contains("Join"),
      "collected bounds must be embedded as literals, not joined")
  }

  test("win_sessionize: ONE user_id shuffle serves window + rollup") {
    val p = plan("win_sessionize")
    // lag, the running session-number sum and the per-session rollup
    // all cluster by user_id; hashpartitioning(user_id) satisfies the
    // rollup's ClusteredDistribution(user_id, session_no), so a second
    // data-sized exchange means the shared window spec broke. The only
    // other exchanges allowed are the final presentation sort's range
    // exchange and AQE's single-partition reads.
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$p")
    // Both window functions (lag + running session sum) must ride ONE
    // sorted pass — two Window nodes over one Sort, no re-sort between.
    assert("\\+- Window".r.findAllIn(p).size == 2, "expected 2 Window nodes")
    assert("\\+- Sort".r.findAllIn(p).size <= 2,
      "windows must share one sort (plus the presentation sort only)")
  }

  test("llm_cluster_kmeans: centroids broadcast, argmax partial-aggregates, " +
    "never a data-sized cartesian or sort-merge") {
    val p = plan("llm_cluster_kmeans")
    // Each Lloyd assignment crossJoins the K-row centroid frame as a
    // broadcast; a CartesianProduct or SortMergeJoin here means the
    // N·K expansion got shuffled — the 100 TB failure mode.
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), "centroids must broadcast")
    assert(!p.contains("CartesianProduct"),
      "assignment must never plan a shuffled cartesian")
    assert(!p.contains("SortMergeJoin"),
      "K-row centroid frames must never force a sort-merge shuffle")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the per-vector argmax must partial-aggregate map-side")
  }

  test("llm_dedup_semantic: cluster-scoped equi-join pairs, no cartesian") {
    val p = plan("llm_dedup_semantic")
    assert(!p.contains("CartesianProduct"),
      "pair generation must ride the cluster equi-key, never all-pairs")
    assert(p.contains("Join") || p.contains("join"),
      "expected the cluster-scoped pair join in the plan")
  }

  test("llm_embed_quantize: 1-row scale broadcasts; no data-sized shuffle") {
    val p = plan("llm_embed_quantize")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), "the scale scalar must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "quantization is in-row; nothing may sort-merge")
    // The only exchanges allowed: the 1-row max aggregate's partial →
    // final step and the presentation sort. The quantize/recon path
    // itself is scan-local.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"quantization must stay scan-local:\n$p")
  }

  test("llm_text_pmi: unigram LM broadcasts onto pair counts") {
    val p = plan("llm_text_pmi")
    assert(p.contains("BroadcastHashJoin"),
      "the vocabulary-sized unigram counts must broadcast-join")
    assert(!p.contains("SortMergeJoin"),
      "no data-sized shuffle join in the PMI scoring")
  }

  test("graph_pagerank: iteration joins partial-aggregate; no cartesian") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"),
      "mass push must ride the src equi-join, never all-pairs")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the 1-row node count must broadcast")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pushed mass must partial-aggregate map-side")
  }

  test("llm_index_inverted: postings cut inside the window; the term " +
    "rollup reuses the window partitioning") {
    val p = plan("llm_index_inverted")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-df cut must not global-sort")
    // Two exchanges: the distinct's (doc_id, term) shuffle and the
    // window's term shuffle. A third means the groupBy(term) after the
    // window stopped reusing hashpartitioning(term).
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex <= 2, s"expected ≤2 hash exchanges, got $ex:\n$p")
  }

  test("join_q18: qualifying set aggregates once and semi-joins back") {
    val p = plan("join_q18")
    assert(p.contains("LeftSemi"), "HAVING subquery must become a semi join")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "both lineitem aggregations must have partial+final stages")
  }

  test("sql_correlated: scalar subquery decorrelates to one aggregate") {
    val p = plan("sql_correlated")
    // Catalyst must rewrite the per-outer-row avg into ONE per-partkey
    // aggregate joined back: exactly two lineitem scans (fact + agg
    // input), no nested-loop re-evaluation.
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "correlated scalar subquery must decorrelate, not nested-loop")
    assert(scanCount(p) == 3,
      "expected exactly fact + dim + one aggregate-input scan")
    assert(p.contains("EqualTo(p_brand,Brand#12)"),
      "brand filter must push to the part scan")
  }

  test("ts_resample: event-type filter pushed, counts broadcast to spine") {
    val p = plan("ts_resample")
    assert(p.contains("EqualTo(event_type,error)"),
      "stream filter must reach the scan")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "bucket-sized counts must broadcast against the generated spine")
  }

  test("profile_entropy: one scan per profiled table, vocab-sized window") {
    val p = plan("profile_entropy")
    assert(scanCount(p) == 3,
      "totals must come from a window, not a join to a re-scanned branch")
    assert(p.contains("Window"), "per-column totals must use a window")
  }

  test("agg_corr/agg_regression: single-scan algebraic partial aggregation") {
    for (q <- Seq("agg_corr", "agg_regression")) {
      val p = plan(q)
      assert(scanCount(p) == 1,
        s"$q must compute all moments in one pass")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q moments must partial-aggregate map-side")
    }
  }

  test("join_q4: EXISTS runs as semi join; both filters reach their scans") {
    val p = plan("join_q4")
    assert(p.contains("LeftSemi"),
      "EXISTS must execute as a semi join, never join+distinct")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date window must push to the orders scan")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag predicate must push to the lineitem scan")
  }

  test("join_q21: one semi + one anti correlation, supplier broadcast") {
    val p = plan("join_q21")
    assert(p.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must become an anti join")
    assert(p.contains("BroadcastHashJoin"),
      "the supplier dim must broadcast onto surviving blame rows")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
  }

  test("llm_sim_lsh: signatures scan-local, probe broadcast, bucketed top-k") {
    val p = plan("llm_sim_lsh")
    assert(!p.contains("CartesianProduct"),
      "anchor projection must be a literal fold, not an anchor crossJoin")
    assert(p.contains("BroadcastExchange"), "1-row probe must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "bucket top-k must not global-sort")
    // No exchange may feed the signature computation: the only shuffle
    // inputs allowed are the broadcast probe and the final top-k.
    assert(!p.contains("SortMergeJoin"),
      "bucket equality must not shuffle the corpus against the probe")
  }

  test("join_q16: NOT IN runs as anti join; part filters prune pre-join") {
    val p = plan("join_q16")
    assert(p.contains("LeftAnti"), "NOT IN must execute as an anti join")
    assert(p.contains("BroadcastHashJoin"),
      "part and exclusion dims must broadcast")
    assert(p.contains("In(p_size"), "size IN-list must push to the part scan")
    // count(DISTINCT) two-stage: partial + final HashAggregates present.
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "distinct suppliers must aggregate in stages")
  }

  test("join_q19: implied bounds pushed to both scans, residual on the join") {
    val p = plan("join_q19")
    assert(p.contains("In(p_brand"),
      "implied brand IN-list must push to the part scan")
    assert(p.contains("LessThanOrEqual(l_quantity,30.0)"),
      "implied quantity bound must push to the lineitem scan")
    assert(p.contains("BroadcastHashJoin"),
      "three-brand part side must broadcast")
    assert(scanCount(p) == 2,
      "the OR must NOT be evaluated as unioned per-branch joins")
  }

  test("llm_text_chunk: map-only chunking — no join, no aggregate") {
    val p = plan("llm_text_chunk")
    assert(p.contains("Generate"), "chunk fan-out must be an explode")
    assert(scanCount(p) == 1)
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "chunking must pipeline scan-local into the sink")
  }

  test("cdc_outbox: router is a pure projection — no join before the rollup") {
    val p = plan("cdc_outbox")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"),
      "route/re-key/forward must stay per-row, joins have no place here")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the consumer rollup must partial-aggregate map-side")
  }

  test("join_q6: all three predicates pushed, no join node") {
    val p = plan("join_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "date window not pushed")
    assert(p.contains("GreaterThanOrEqual(l_discount"), "discount band not pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity cap not pushed")
    assert(!p.contains("Join"), "Q6 is a pure scan-aggregate")
  }

  test("join_q7/q8: every dim leg broadcasts; one shuffled fact join") {
    for (q <- Seq("join_q7", "join_q8")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q dims must broadcast")
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val shj = "ShuffledHashJoin".r.findAllIn(p).size
      assert(smj + shj <= 1,
        s"$q: only lineitem-orders may shuffle, found ${smj + shj} shuffled joins")
    }
  }

  test("join_q10: top-20 plans as TakeOrderedAndProject") {
    val p = plan("join_q10")
    assert(p.contains("TakeOrderedAndProject"), "ranking must not global-sort")
  }

  test("join_q13: orders pre-aggregate before the outer join") {
    val p = plan("join_q13")
    // The aggregate must sit BELOW the join in execution order — i.e.
    // print-order index of the join is smaller (formatted plans print
    // leaf-last), proving the join's right side is customer-cardinality.
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx >= 0 && joinIdx < aggIdx,
      "orders must collapse to per-customer counts before joining")
  }

  test("join_q12: date window pushed; exactly one join; partial agg") {
    val p = plan("join_q12")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship-date window must push to the lineitem scan")
    // One lineitem-orders join only (broadcast at this SF; the same
    // plan shuffle-joins once statistics say orders won't fit).
    assert("Join type: Inner".r.findAllIn(p).size == 1,
      "lineitem-orders must join exactly once")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "conditional counts must partial-aggregate map-side")
  }

  test("join_q11: stats branch reads the cached value frame, not a rescan") {
    val p = plan("join_q11")
    assert(p.contains("InMemoryTableScan") || scanCount(p) == 1,
      "the denominator rollup must not re-aggregate lineitem")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
        || p.contains("BroadcastHashJoin"),
      "the (total, count) rollup must broadcast over the value frame")
  }

  test("join_interval: block bucketing keeps the overlap join out of " +
      "the nested loop") {
    val p = plan("join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "interval overlap must equi-join on the time block, never " +
        "nested-loop the theta predicate")
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size >= 2,
      "both sides must explode into their time blocks")
  }

  test("join_q2: min-cost equality join reuses the cached cost frame; " +
    "top-100 never global-sorts") {
    val p = plan("join_q2")
    assert(p.contains("InMemoryTableScan"),
      "the per-part min must read the cached region-cost frame, not " +
        "re-aggregate lineitem")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-100 cut must plan as TakeOrderedAndProject")
    assert(p.contains("BroadcastHashJoin"),
      "the size/type-filtered part dim must broadcast")
  }

  test("join_q9: part filter prunes the fact scan; profit partial-aggregates") {
    val p = plan("join_q9")
    assert(p.contains("BroadcastHashJoin"),
      "the red-part dim must broadcast-prune lineitem")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-(nation, year) profit must partial-aggregate map-side")
    assert(!p.contains("CartesianProduct"), "no cartesian in the join tree")
  }

  test("join_q20: both IN subqueries run as semi joins; part prunes first") {
    val p = plan("join_q20")
    assert("Join type: LeftSemi".r.findAllIn(p).size == 2,
      "part IN-prune and supplier IN must both be semi joins")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship window must push to the lineitem scan")
    // The part semi join broadcasts (tiny name-filtered dim).
    assert(p.contains("BroadcastHashJoin"), "part prune must broadcast")
  }

  test("dsq_hour_bands: all eight bands fold into ONE scan and one " +
      "partial/final aggregate — no self-joins") {
    val p = plan("dsq_hour_bands")
    assert(scanCount(p) === 1, s"expected 1 scan, got ${scanCount(p)}")
    assert(!p.contains("Join"), "the Q88 rewrite has no join at all")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "band counts must partial-aggregate map-side")
  }

  test("sql_lateral: the correlated top-2 decorrelates into a window " +
      "rank over one customer pass — never per-outer-row re-execution") {
    val p = plan("sql_lateral")
    assert(p.contains("Window"),
      "lateral ORDER BY+LIMIT must become a rank window")
    assert(!p.contains("CartesianProduct"), "no nested-loop re-execution")
    assert(scanCount(p) === 2, s"expected 2 scans, got ${scanCount(p)}")
  }

  test("graph_bfs: hops expand by broadcast equi-joins — no cartesian, " +
      "min-label fold partial-aggregates") {
    val p = plan("graph_bfs")
    assert(!p.contains("CartesianProduct"), "no hop may nested-loop")
    assert(p.contains("BroadcastHashJoin"),
      "the frontier must broadcast against the edge list")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the min-hop fold must partial-aggregate map-side")
  }

  test("llm_sim_binary: broadcast 1-row probe, TakeOrdered cuts at " +
      "both funnel stages, no shuffle over candidates") {
    val p = plan("llm_sim_binary")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "both the Hamming cut and the cosine cut must be TakeOrdered")
    assert(p.contains("BroadcastExchange"),
      "the 1-row probe signature must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "candidate generation must stay a broadcast nested-loop of " +
        "the 1-row probe, never a shuffle join")
    assert(!p.contains("Exchange hashpartitioning"),
      "nothing in the funnel justifies a hash shuffle")
  }
}
