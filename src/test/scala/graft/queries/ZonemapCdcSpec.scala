package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The zone map UNDER CDC (`layout_zonemap_incremental`): after a
  * micro-batch partition-merge, the REFRESHED stats map must (a) carry
  * untouched partitions' entries over unscanned, (b) prune correctly,
  * and (c) the STALE pre-merge map must be demonstrably wrong — the
  * counterexample that motivates wiring the refresh into the commit
  * path at all.
  */
class ZonemapCdcSpec extends SparkTestBase {

  test("refresh carries untouched entries, prunes correctly; the " +
      "stale map dangles on replaced files and misses late inserts") {
    val dir = graft.Scratch.dir("graft-zmi-spec-").toString
    val laid = s"$dir/orders_by_year"
    MaintenanceQueries.zmiBuildLayout(spark, sf, laid)
    val statsV0 = MaintenanceQueries.zmiStats(spark, laid)

    val years = MaintenanceQueries.zmiApplyBatch(spark, sf, laid)
    assert(years === Seq(1996, 1997),
      "the engineered batch touches exactly the 1996+1997 partitions")

    val fresh = MaintenanceQueries.zmiStats(spark, laid, Some(years))
    val refreshed = MaintenanceQueries.zmiRefresh(statsV0, years, fresh)

    // (a) Incremental-ness: every entry OUTSIDE the affected years is
    // the v0 entry, bit-for-bit — no rescan of untouched partitions —
    // and the fresh scan saw ONLY affected-year files.
    val untouched = refreshed.filterNot { case (f, _) =>
      years.exists(y => f.contains(s"/yr=$y/")) }
    assert(untouched.nonEmpty)
    untouched.foreach { case (f, range) =>
      assert(statsV0(f) === range, s"untouched entry rescanned/changed: $f")
    }
    assert(fresh.keys.forall(f =>
      years.exists(y => f.contains(s"/yr=$y/"))),
      "the incremental stats scan leaked outside the affected partitions")

    // (b) The refreshed map's pruned answer equals the full post-merge
    // scan (no map at all).
    val pruned = MaintenanceQueries.zmiPrunedQuery(spark, refreshed)
      .collect()
    val full = spark.read.parquet(laid)
      .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")
      .collect()
    assert(pruned.map(_.toString).toSeq === full.map(_.toString).toSeq,
      "refreshed-map pruning must be answer-identical to a full scan")
    // And it genuinely pruned: the window touches 2 of >=6 year dirs.
    val keptYears = refreshed.toSeq
      .filter { case (_, (lo, hi)) => hi >= ts("1996-04-01") &&
        lo <= ts("1997-03-31") }
      .flatMap { case (f, _) => "yr=(\\d+)".r.findFirstMatchIn(f)
        .map(_.group(1).toInt) }.distinct.sorted
    assert(keptYears === Seq(1996, 1997), s"kept $keptYears")

    // (c) The STALE map is broken two ways after the merge:
    //   1. its 1996/1997 entries name files dynamic-partition-overwrite
    //      DELETED — a pruned scan through it dangles;
    val staleKept = statsV0.toSeq
      .filter { case (_, (lo, hi)) => hi >= ts("1996-04-01") &&
        lo <= ts("1997-03-31") }
      .map(_._1)
    val dangling = staleKept.filterNot(f => java.nio.file.Files.exists(
      java.nio.file.Paths.get(f.stripPrefix("file:"))))
    assert(dangling.nonEmpty,
      "replaced partitions' old files must be gone — else the merge " +
        "never replaced anything and this spec tests nothing")
    //   2. even re-pointed at surviving files only, it undercounts: the
    //      late 1996 inserts live in files the v0 map has never heard
    //      of.
    val staleSurvivors = staleKept.filterNot(dangling.contains)
    val staleRows =
      if (staleSurvivors.isEmpty) 0L
      else spark.read.parquet(staleSurvivors: _*)
        .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .count()
    val trueRows = full.map(_.getLong(1)).sum
    assert(staleRows < trueRows,
      s"stale map must miss the merged rows: $staleRows vs $trueRows")
  }

  private def ts(d: String): Long =
    java.time.LocalDate.parse(d).atStartOfDay
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
}
