package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Functional invariants for the time-series / statistical-profiling
  * family (AnalyticsOps) — properties that must hold on ANY input, so
  * they guard semantics independent of the fixture values the DuckDB
  * oracle pins.
  */
class AnalyticsOpsSpec extends SparkTestBase {

  test("ts_resample: spine is contiguous hourly, gaps surface as zeros") {
    val rows = AnalyticsOps.tsResample(spark, sf)
      .select(col("bucket").cast("long"), col("n_events"), col("n_users"))
      .collect()
    assert(rows.nonEmpty)
    val hours = rows.map(_.getLong(0))
    // contiguous: every adjacent pair is exactly 3600s apart
    hours.sliding(2).foreach { case Array(a, b) =>
      assert(b - a == 3600L, s"spine gap between $a and $b")
    }
    // zero-fill semantics: a silent hour appears with 0 events AND 0 users
    rows.foreach { r =>
      assert((r.getLong(1) == 0) == (r.getLong(2) == 0),
        "n_events and n_users must be zero together on gap rows")
    }
  }

  test("ts_interpolate: every bucket filled; estimates bounded by neighbors") {
    val rows = AnalyticsOps.tsInterpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.isNullAt(1), "filled must never be NULL"))
    val vals = rows.map(r => (r.getDouble(1), r.getBoolean(2)))
    val observed = vals.collect { case (v, false) => v }
    assert(observed.nonEmpty)
    val (lo, hi) = (observed.min, observed.max)
    // A midpoint of observed neighbors can never leave the observed range.
    vals.collect { case (v, true) => v }.foreach(v =>
      assert(v >= lo && v <= hi, s"interpolated $v escapes [$lo, $hi]"))
  }

  test("ts_anomaly: first day per type scores NULL (no trailing baseline)") {
    val rows = AnalyticsOps.tsAnomaly(spark, sf).collect()
    val byType = rows.groupBy(_.getString(1))
    byType.values.foreach { days =>
      // ordered by day within type; rows 0 and 1 have <2 trailing days
      assert(days(0).isNullAt(3), "day 0 must have NULL zscore")
      assert(days(1).isNullAt(3), "day 1 must have NULL zscore")
    }
    // anomaly flag is defined exactly where the score is
    rows.foreach(r => assert(r.isNullAt(3) == r.isNullAt(4)))
  }

  test("win_retention: offset-0 cell equals cohort size and bounds every cell") {
    val rows = AnalyticsOps.winRetention(spark, sf).collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.collect { case (c, 0L, n) => c -> n }.toMap
    assert(cohortSize.nonEmpty)
    rows.foreach { case (c, off, n) =>
      assert(off >= 0, "activity cannot precede the first order")
      assert(n <= cohortSize(c),
        s"cohort $c offset $off: $n active exceeds cohort ${cohortSize(c)}")
    }
  }

  test("agg_corr: six distinct pairs, all within [-1, 1]") {
    val rows = AnalyticsOps.aggCorr(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("agg_regression: r2 in [0,1], group counts sum to table size") {
    val rows = AnalyticsOps.aggRegression(spark, sf).collect()
    rows.foreach { r =>
      val r2 = r.getDouble(3)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
    val total = graft.Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(4)).sum == total)
  }

  test("profile_entropy: 0 <= H <= log2(n_distinct)") {
    val rows = AnalyticsOps.profileEntropy(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (h, k) = (r.getDouble(1), r.getLong(2))
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, log2($k)]")
    }
  }

  test("ts_changepoint: final CUSUM telescopes to zero; exactly one argmax") {
    val rows = AnalyticsOps.tsChangepoint(spark, sf).collect()
    assert(rows.nonEmpty)
    // sum of deviations from the series mean over the WHOLE series is 0
    // by construction — the last cumulative value must round back to it.
    assert(math.abs(rows.last.getDouble(2)) < 1e-3,
      s"final CUSUM ${rows.last.getDouble(2)} must telescope to ~0")
    val flagged = rows.filter(_.getBoolean(3))
    assert(flagged.length == 1, "exactly one change-point must be flagged")
    val maxAbs = rows.map(r => math.abs(r.getDouble(2))).max
    assert(math.abs(flagged.head.getDouble(2)) == maxAbs,
      "the flagged day must carry the maximal |CUSUM|")
  }

  test("ts_seasonal: day coverage partitions the series; indices average 1") {
    val rows = AnalyticsOps.tsSeasonal(spark, sf).collect()
    assert(rows.length <= 7 && rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) <= 6))
    val nDays = AnalyticsOps.tsChangepoint(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDays,
      "weekday buckets must partition the observed days exactly")
    assert(rows.count(_.getBoolean(4)) == 1, "exactly one peak weekday")
    val meanIdx = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(meanIdx - 1.0) < 1e-3,
      s"seasonal indices must average ~1, got $meanIdx")
  }

  test("ts_acf: three lags, r in [-1,1], pair counts shrink by one per lag") {
    val rows = AnalyticsOps.tsAcf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3))
    rows.foreach { case (lag, nPairs, acf) =>
      assert(acf >= -1.0 && acf <= 1.0, s"acf at lag $lag out of range")
      assert(nPairs > 0, s"lag $lag has no pairs")
    }
    val days = rows.head._2 + 1 // n_pairs at lag 1 = days - 1
    rows.foreach { case (lag, nPairs, _) =>
      assert(nPairs === days - lag,
        s"lag $lag must lose exactly $lag tail pairs")
    }
  }

  test("ts_ccf: five lags, r in [-1,1], symmetric pair loss") {
    val rows = AnalyticsOps.tsCcf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(-2, -1, 0, 1, 2))
    rows.foreach { case (lag, n, ccf) =>
      assert(ccf >= -1.0 && ccf <= 1.0, s"ccf at lag $lag out of range")
      assert(n > 0, s"lag $lag has no pairs")
    }
    val byLag = rows.map(r => r._1 -> r._2).toMap
    assert(byLag(-1) === byLag(1) && byLag(-2) === byLag(2),
      "lag ±k lose the same number of boundary pairs")
    assert(byLag(0) === byLag(1) + 1, "each lag step loses one pair")
  }

  test("join_asof_nearest: matches stay inside the tolerance and are " +
      "unique per purchase") {
    val rows = Relational.joinAsofNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("purchase_id")).distinct.length ===
      rows.length, "one nearest click per purchase")
    rows.foreach { r =>
      val d = r.getAs[Long]("delta_us")
      assert(math.abs(d) <= 3600L * 1000000L,
        s"delta $d outside the ±1 h tolerance")
    }
  }

  test("win_funnel: stage survivors are monotone; rates consistent") {
    val rows = AnalyticsOps.winFunnel(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val ns = rows.map(_._2)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      "a later stage can never have more survivors than an earlier one")
    assert(rows(0)._3.isEmpty, "the entry stage has no step rate")
    rows.drop(1).zip(ns.sliding(2).toSeq).foreach {
      case ((_, n, Some(rate)), Array(prev, _)) =>
        assert(math.abs(rate - n.toDouble / prev) < 1e-6 || prev == 0)
      case ((stage, _, None), _) => fail(s"$stage must have a step rate")
    }
  }
}
