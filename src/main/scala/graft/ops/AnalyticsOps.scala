package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series and statistical-profiling operators over the fixture
  * tables — the observability layer a lakehouse team runs on top of the
  * CDC-maintained tables the reference produces (its Trino surface
  * advertises full SQL; these are the standing analytic queries that
  * surface would serve — SURVEY.md §2 Tier C closure).
  *
  * Scale posture (100 TB): every operator here pre-aggregates to a
  * bounded-cardinality frame (time buckets, cohort cells, per-group
  * moments) BEFORE any join or window — the shuffles carry O(groups)
  * rows, never O(input). The only full-input pass is the initial
  * map-side-combined groupBy, which scans once with only the referenced
  * columns (column pruning reaches the parquet scan).
  */
object AnalyticsOps {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  /** Gap-filled time-series resample: per-hour event/user counts for the
    * `error` stream, with EXPLICIT zero rows for silent hours — the shape
    * monitoring needs (a missing bucket and a zero bucket are different
    * facts; an outer join against a generated spine makes silence
    * visible). The spine derives from min/max of the DATA (one tiny agg),
    * so the operator needs no external calendar.
    *
    * Scale: counts pre-aggregate map-side to O(hours) rows; the spine is
    * O(hours) rows generated from a single-row agg. The left join runs
    * over two bucket-count-sized frames — Spark broadcasts the smaller
    * side; input size only affects the initial scan.
    */
  def tsResample(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .select(date_trunc("HOUR", col("ts")).as("h"), col("user_id"))
    val counts = e.groupBy("h").agg(
      count(lit(1)).as("n_events"),
      countDistinct("user_id").as("n_users"))
    val spine = e.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
    spine.join(counts, spine("bucket") === counts("h"), "left")
      .select(col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("bucket")
  }

  val tsResampleOracle: String =
    """WITH e AS (SELECT date_trunc('hour', ts) AS h, user_id FROM events
      |           WHERE event_type = 'error'),
      |b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
      |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b),
      |c AS (SELECT h, count(*) AS n, count(DISTINCT user_id) AS nu FROM e GROUP BY h)
      |SELECT s.bucket, coalesce(c.n, 0) AS n_events, coalesce(c.nu, 0) AS n_users
      |FROM s LEFT JOIN c ON c.h = s.bucket ORDER BY bucket""".stripMargin

  /** Gap interpolation — the step after [[tsResample]]'s zero-fill when
    * the series is a LEVEL (mean purchase value), not a count: a silent
    * hour's value is estimated as the midpoint of the nearest observed
    * neighbors (`last IGNORE NULLS` looking back, `first IGNORE NULLS`
    * looking forward), degrading to one-sided fill at the series edges.
    * `interpolated` marks estimated rows — consumers must be able to
    * tell measurement from inference.
    *
    * Scale: everything after the initial map-side-combined per-hour agg
    * runs over the bucket-count-sized frame; the unpartitioned window
    * is metadata-sized by construction (one row per hour). A
    * multi-series variant partitions the window by series key and
    * keeps the same shape.
    */
  def tsInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(date_trunc("HOUR", col("ts")).as("h"), col("value"))
    val counts = e.groupBy("h").agg(round(avg("value"), 6).as("v"))
    val spine = e.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
    val g = spine.join(counts, spine("bucket") === counts("h"), "left")
      .select(col("bucket"), col("v"))
    val wPrev = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    g.select(col("bucket"), col("v"),
        last("v", ignoreNulls = true).over(wPrev).as("prev_v"),
        first("v", ignoreNulls = true).over(wNext).as("next_v"))
      .select(col("bucket"),
        round(coalesce(col("v"), (col("prev_v") + col("next_v")) / 2.0d,
          col("prev_v"), col("next_v")), 6).as("filled"),
        col("v").isNull.as("interpolated"))
      .orderBy("bucket")
  }

  val tsInterpolateOracle: String =
    """WITH e AS (SELECT date_trunc('hour', ts) AS h, value FROM events
      |           WHERE event_type = 'purchase'),
      |b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
      |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
      |        AS bucket FROM b),
      |c AS (SELECT h, round(avg(value), 6) AS v FROM e GROUP BY h),
      |g AS (SELECT s.bucket, c.v FROM s LEFT JOIN c ON c.h = s.bucket),
      |f AS (SELECT bucket, v,
      |        last_value(v IGNORE NULLS) OVER (ORDER BY bucket
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
      |        first_value(v IGNORE NULLS) OVER (ORDER BY bucket
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
      |      FROM g)
      |SELECT bucket,
      |  round(coalesce(v, (prev_v + next_v) / 2.0, prev_v, next_v), 6)
      |    AS filled,
      |  v IS NULL AS interpolated
      |FROM f ORDER BY bucket""".stripMargin

  /** Trailing-window anomaly detection: daily counts per event type
    * scored against the mean/stddev of the PRECEDING 7 days (frame
    * excludes the current row — the score must not see the value it
    * judges). Rows with an undefined baseline (<2 trailing days, or a
    * zero-variance window) score NULL rather than a fake 0 — absence of
    * evidence is surfaced, not smoothed over.
    *
    * Scale: the full input collapses to O(days × types) in one
    * map-side-combined agg; the window then partitions by event_type —
    * at 100 TB the per-partition state is one row per day, so even a
    * decade of history is thousands of rows per type, never input-sized.
    */
  def tsAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val d = t(spark, sfDir, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val undefined = col("sd").isNull || col("sd") === 0d
    d.select(col("day"), col("event_type"), col("cnt"),
        avg("cnt").over(w).as("mu"), stddev_samp("cnt").over(w).as("sd"))
      .select(col("day"), col("event_type"), col("cnt"),
        when(undefined, lit(null))
          .otherwise(round((col("cnt") - col("mu")) / col("sd"), 6))
          .as("zscore"),
        when(undefined, lit(null))
          .otherwise(abs((col("cnt") - col("mu")) / col("sd")) > 2d)
          .as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  val tsAnomalyOracle: String =
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
      |w AS (SELECT day, event_type, cnt,
      |    avg(cnt) OVER win AS mu, stddev_samp(cnt) OVER win AS sd
      |  FROM d WINDOW win AS (PARTITION BY event_type ORDER BY day
      |                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, event_type, cnt,
      |  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
      |       ELSE round((cnt - mu) / sd, 6) END AS zscore,
      |  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
      |       ELSE abs((cnt - mu) / sd) > 2 END AS is_anomaly
      |FROM w ORDER BY event_type, day""".stripMargin

  /** Cohort retention over orders: customers grouped by the month of
    * their FIRST order; each cell counts how many of a cohort ordered
    * again `month_offset` months later. The TPC-H date spread (~10
    * orders per customer over 6+ years) yields a real decay matrix —
    * the standing product-analytics query every warehouse runs.
    *
    * Scale: first-order month is a min-aggregate shuffled by customer
    * (map-side combined); the activity join is keyed on the same
    * customer column, so AQE can plan it shuffle-local, and the final
    * distinct-count shuffle carries (cohort, offset, customer) triples —
    * bounded by active customer-months, a fraction of input rows.
    */
  /** CUMULATIVE REACH — distinct users ever seen, per day. Written in
    * the FIRST-SEEN formulation: reach(d) = count of users whose first
    * event day ≤ d, i.e. per-user min-day (one partial-aggregated
    * groupBy), per-day new-user counts (a second), and a running sum
    * over the day frame. The naive spelling — COUNT(DISTINCT) over an
    * expanding window, or size(collect_set) OVER — buffers the
    * distinct set per row and cannot scale; first-seen is the
    * standard rewrite that makes cumulative-distinct a pair of hash
    * aggregates plus a metadata-frame window, at any user count.
    */
  def winReach(spark: SparkSession, sfDir: String): DataFrame = {
    val firstSeen = t(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(min(date_trunc("DAY", col("ts"))).as("d0"))
      .groupBy("d0").agg(count(lit(1)).as("new_users"))
    val allDays = t(spark, sfDir, "events")
      .select(date_trunc("DAY", col("ts")).as("d")).distinct()
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allDays.join(firstSeen, col("d") === col("d0"), "left_outer")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("reach", sum("new_users").over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("new_users"), col("reach"))
      .orderBy("day")
  }

  val winReachOracle: String =
    """WITH first_seen AS (
      |  SELECT user_id, min(date_trunc('day', ts)) AS d0
      |  FROM events GROUP BY 1
      |), per_day AS (
      |  SELECT d0, count(*) AS new_users FROM first_seen GROUP BY 1
      |), all_days AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS d FROM events
      |)
      |SELECT strftime(d, '%Y-%m-%d') AS day,
      |  COALESCE(new_users, 0) AS new_users,
      |  CAST(sum(COALESCE(new_users, 0)) OVER (
      |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS reach
      |FROM all_days LEFT JOIN per_day ON d = d0
      |ORDER BY day""".stripMargin

  def winRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val first = o.groupBy("o_custkey")
      .agg(date_trunc("MONTH", min("o_orderdate")).as("cohort"))
    val activity = o.select(col("o_custkey"),
      date_trunc("MONTH", col("o_orderdate")).as("m"))
    activity.join(first, "o_custkey")
      .select(col("cohort"),
        months_between(col("m"), col("cohort")).cast("long")
          .as("month_offset"),
        col("o_custkey"))
      .groupBy("cohort", "month_offset")
      .agg(countDistinct("o_custkey").as("n_active"))
      .orderBy("cohort", "month_offset")
  }

  val winRetentionOracle: String =
    """WITH f AS (SELECT o_custkey,
      |    CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS cohort
      |  FROM orders GROUP BY 1),
      |e AS (SELECT o_custkey,
      |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m FROM orders),
      |j AS (SELECT f.cohort, date_diff('month', f.cohort, e.m) AS month_offset,
      |    e.o_custkey
      |  FROM e JOIN f ON f.o_custkey = e.o_custkey)
      |SELECT cohort, CAST(month_offset AS BIGINT) AS month_offset,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Pairwise Pearson correlation matrix over lineitem's numeric
    * columns, unpivoted to (col_a, col_b, pearson) rows. All six
    * pairs compute in ONE aggregate pass (one scan, one reduce); the
    * matrix shape is produced by `stack` AFTER aggregation, so the
    * Expand operates on a single row, not the input.
    *
    * Scale: `corr` is an algebraic aggregate (co-moment sums) — partial
    * per partition, merged on one reducer row. Adding columns grows the
    * aggregate width, never the shuffle row count.
    */
  def aggCorr(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(
        corr("l_quantity", "l_extendedprice").as("c1"),
        corr("l_quantity", "l_discount").as("c2"),
        corr("l_quantity", "l_tax").as("c3"),
        corr("l_extendedprice", "l_discount").as("c4"),
        corr("l_extendedprice", "l_tax").as("c5"),
        corr("l_discount", "l_tax").as("c6"))
      .select(expr(
        """stack(6,
          |  'l_quantity', 'l_extendedprice', round(c1, 6),
          |  'l_quantity', 'l_discount', round(c2, 6),
          |  'l_quantity', 'l_tax', round(c3, 6),
          |  'l_extendedprice', 'l_discount', round(c4, 6),
          |  'l_extendedprice', 'l_tax', round(c5, 6),
          |  'l_discount', 'l_tax', round(c6, 6)
          |) AS (col_a, col_b, pearson)""".stripMargin))
      .orderBy("col_a", "col_b")

  val aggCorrOracle: String =
    """WITH a AS (SELECT
      |  corr(l_quantity, l_extendedprice) c1, corr(l_quantity, l_discount) c2,
      |  corr(l_quantity, l_tax) c3, corr(l_extendedprice, l_discount) c4,
      |  corr(l_extendedprice, l_tax) c5, corr(l_discount, l_tax) c6
      |FROM lineitem)
      |SELECT * FROM (
      |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
      |    round(c1, 6) AS pearson FROM a
      |  UNION ALL SELECT 'l_quantity', 'l_discount', round(c2, 6) FROM a
      |  UNION ALL SELECT 'l_quantity', 'l_tax', round(c3, 6) FROM a
      |  UNION ALL SELECT 'l_extendedprice', 'l_discount', round(c4, 6) FROM a
      |  UNION ALL SELECT 'l_extendedprice', 'l_tax', round(c5, 6) FROM a
      |  UNION ALL SELECT 'l_discount', 'l_tax', round(c6, 6) FROM a)
      |ORDER BY col_a, col_b""".stripMargin

  /** Per-group OLS regression (extendedprice ~ quantity by returnflag)
    * via the SQL-standard regr_* aggregate family — slope, intercept,
    * r², and the pair count that actually entered the fit. Slope and
    * intercept round at 4dp (they sit on ~5e4 magnitudes where 6dp
    * would demand 1e-11 relative agreement across engines' summation
    * orders); r² is in [0,1] and rounds at 6dp.
    *
    * Scale: regr_* are algebraic (sum/sum-of-product moments) — fully
    * map-side combinable, O(groups) reduce rows.
    */
  def aggRegression(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4)
          .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4)
          .as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy("l_returnflag")

  val aggRegressionOracle: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** PER-SERIES TREND FORECAST — the capacity-planning query on top
    * of the series toolkit: each event type's daily mean regresses on
    * the day index (regr_slope/intercept over ~30 points — algebraic
    * moments, map-side combinable like [[aggRegression]]) and projects
    * 7 days past the last observation. The projection is computed FROM
    * THE ROUNDED coefficients (4 dp, the agg_regression precedent for
    * cross-engine summation-order stability), so both engines derive
    * the identical forecast from identical published numbers — the
    * same round-then-derive discipline as the incremental-IVF
    * centroids. Scale: the regression consumes the DAYS×TYPES rollup,
    * a metadata frame at any corpus size.
    */
  def tsForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("d"))
      .agg(round(avg("value"), 6).as("x"))
      .withColumn("t",
        datediff(col("d"), lit("2024-01-01").cast("date")).cast("double"))
    daily.groupBy("event_type")
      .agg(
        round(expr("regr_slope(x, t)"), 4).as("slope"),
        round(expr("regr_intercept(x, t)"), 4).as("intercept"),
        round(expr("regr_r2(x, t)"), 6).as("r2"),
        max("t").as("t_last"))
      .withColumn("forecast_7d",
        round(col("intercept") + col("slope") * (col("t_last") + 7), 4))
      .select("event_type", "slope", "intercept", "r2", "forecast_7d")
      .orderBy("event_type")
  }

  val tsForecastOracle: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    ROUND(avg(value), 6) AS x
      |  FROM events GROUP BY 1, 2
      |), i AS (
      |  SELECT event_type, x,
      |    CAST(date_diff('day', DATE '2024-01-01', d) AS DOUBLE) AS t
      |  FROM d
      |), f AS (
      |  SELECT event_type,
      |    ROUND(regr_slope(x, t), 4) AS slope,
      |    ROUND(regr_intercept(x, t), 4) AS intercept,
      |    ROUND(regr_r2(x, t), 6) AS r2,
      |    max(t) AS t_last
      |  FROM i GROUP BY 1
      |)
      |SELECT event_type, slope, intercept, r2,
      |  ROUND(intercept + slope * (t_last + 7), 4) AS forecast_7d
      |FROM f ORDER BY event_type""".stripMargin

  /** Shannon entropy per categorical column across tables — the
    * data-profiling signal that ranks columns by information content
    * (a 0-entropy column is constant; log2(k)-entropy is uniform).
    * Three columns profile in one plan: a union of (column, value)
    * pairs, one count aggregate, one per-column rollup.
    *
    * Scale: the union scans each table ONCE with one pruned column; the
    * count shuffle carries distinct (column, value) pairs — bounded by
    * vocabulary, not rows. Column totals come from a window over that
    * vocabulary-sized frame (NOT a join back to a recomputed branch,
    * which would re-scan the full input a second time — the plan has
    * exactly one scan per profiled table, PlanSpec-guarded).
    */
  def profileEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(lit("events.event_type").as("col"), col("event_type").as("v"))
    val docs = t(spark, sfDir, "documents")
    val g = ev
      .unionAll(docs.select(lit("documents.lang").as("col"),
        col("lang").as("v")))
      .unionAll(docs.select(lit("documents.source").as("col"),
        col("source").as("v")))
    val c = g.groupBy("col", "v").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("col")
    val p = col("n").cast("double") / col("s")
    c.select(col("col"), col("n"),
        sum("n").over(w).as("s"), count(lit(1)).over(w).as("k"))
      .groupBy("col")
      .agg(round(sum(-p * log2(p)), 6).as("entropy"),
        max("k").as("n_distinct"))
      .orderBy("col")
  }

  val profileEntropyOracle: String =
    """WITH g AS (
      |  SELECT 'events.event_type' AS col, event_type AS v FROM events
      |  UNION ALL SELECT 'documents.lang', lang FROM documents
      |  UNION ALL SELECT 'documents.source', source FROM documents),
      |c AS (SELECT col, v, count(*) AS n FROM g GROUP BY 1, 2),
      |t AS (SELECT col, sum(n) AS s, count(*) AS k FROM c GROUP BY 1)
      |SELECT c.col, round(sum(-(n / s) * log2(n / s)), 6) AS entropy,
      |  CAST(max(k) AS BIGINT) AS n_distinct
      |FROM c JOIN t ON t.col = c.col GROUP BY c.col ORDER BY c.col""".stripMargin

  /** CUSUM change-point detection over the daily purchase-count series:
    * the cumulative sum of deviations from the series mean drifts while
    * the level is stable and turns sharply where the mean shifts; the
    * day with the largest |CUSUM| is the single best change-point
    * estimate (Page's classic offline CUSUM). Every day is returned
    * with its statistic so consumers see the whole drift profile, with
    * `is_changepoint` marking the argmax (earliest day on exact-rounded
    * ties — a total order both engines reproduce).
    *
    * Scale: the input collapses to O(days) rows in one map-side-combined
    * agg; the mean, the running sum and the argmax rank are windows over
    * that metadata-sized frame. A per-series variant adds the series key
    * to every partitionBy and keeps the shape. The cumulative sum is
    * evaluated in day order in BOTH engines (sequential left-to-right),
    * so the 6dp round compares bit-stable doubles.
    */
  def tsChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val d = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = d
      .withColumn("mu", avg("cnt").over(Window.partitionBy()))
      .withColumn("cusum",
        round(sum(col("cnt") - col("mu")).over(wCum), 6))
    val wRank = Window.orderBy(abs(col("cusum")).desc, col("day"))
    g.select(col("day"), col("cnt"), col("cusum"),
        (row_number().over(wRank) === 1).as("is_changepoint"))
      .orderBy("day")
  }

  val tsChangepointOracle: String =
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    count(*) AS cnt FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1),
      |m AS (SELECT day, cnt, avg(cnt) OVER () AS mu FROM d),
      |g AS (SELECT day, cnt,
      |    round(sum(cnt - mu) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cusum
      |  FROM m)
      |SELECT day, cnt, cusum,
      |  (row_number() OVER (ORDER BY abs(cusum) DESC, day) = 1)
      |    AS is_changepoint
      |FROM g ORDER BY day""".stripMargin

  /** Day-of-week seasonality profile of the purchase stream: mean daily
    * count per weekday, its ratio to the overall daily mean (the
    * seasonal index — >1 means that weekday runs hot), and the peak
    * weekday flagged. The profile any capacity planner or anomaly
    * baseline consumes before [[tsAnomaly]]'s trailing window makes
    * sense. Weekday numbering is 0=Sunday..6 (both engines' native
    * conventions reconciled: Spark's dayofweek is 1-based).
    *
    * Scale: input collapses to O(days) map-side, then O(7); the windows
    * run over the 7-row frame. Per-series seasonality adds the series
    * key to every grouping, same shape.
    */
  def tsSeasonal(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val byDow = daily
      .groupBy((dayofweek(col("day")) - 1).as("dow"))
      .agg(round(avg("cnt"), 6).as("mean_daily"),
        count(lit(1)).as("n_days"))
    val overall = Window.partitionBy()
    byDow
      .withColumn("seasonal_idx",
        round(col("mean_daily") / avg("mean_daily").over(overall), 6))
      .withColumn("is_peak",
        row_number().over(
          Window.orderBy(col("mean_daily").desc, col("dow"))) === 1)
      .orderBy("dow")
  }

  val tsSeasonalOracle: String =
    """WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS cnt
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |w AS (SELECT dayofweek(day) AS dow, round(avg(cnt), 6) AS mean_daily,
      |    count(*) AS n_days
      |  FROM d GROUP BY 1)
      |SELECT CAST(dow AS INT) AS dow, mean_daily, n_days,
      |  round(mean_daily / avg(mean_daily) OVER (), 6) AS seasonal_idx,
      |  (row_number() OVER (ORDER BY mean_daily DESC, dow) = 1) AS is_peak
      |FROM w ORDER BY dow""".stripMargin

  /** SEQUENCE-PATTERN BURST DETECTOR — "an error followed by ≥3
    * clicks within 24 hours from the same user", the
    * MATCH_RECOGNIZE-flavored alert shape (rage-click / retry-storm
    * detection) expressed as ONE window pass: per user, a RANGE frame
    * over event-time seconds counts the following day's clicks
    * for every row, and error rows past the threshold emit. No
    * self-join, no per-pattern scan — the frame is computed once per
    * row in a single user-partitioned sort, and being a VALUE frame
    * it is tie-stable by construction (same-second events land in or
    * out of the frame by value, not by row order).
    *
    * Scale: one shuffle by user_id, one sort per partition, frame
    * work bounded by events-per-day-window — the plan a billion-
    * event day wants; widening the pattern (more event types, longer
    * windows) adds conditional sums to the SAME pass, never a join.
    */
  def winPatternBurst(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsec"))
      .rangeBetween(1, 86400)
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), unix_timestamp(col("ts")).as("tsec"))
      .withColumn("clicks_24h",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "error" && col("clicks_24h") >= 3)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("err_us"), col("clicks_24h"))
      .orderBy("user_id", "event_id")
  }

  val winPatternBurstOracle: String =
    """SELECT user_id, event_id, epoch_us(ts) AS err_us, clicks_24h
      |FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
      |      RANGE BETWEEN 1 FOLLOWING AND 86400 FOLLOWING
      |    ) AS BIGINT) AS clicks_24h
      |  FROM events)
      |WHERE event_type = 'error' AND clicks_24h >= 3
      |ORDER BY user_id, event_id""".stripMargin

  /** Ordered conversion funnel view → click → purchase: a user converts
    * at a stage only via events STRICTLY AFTER their entry to the
    * previous stage (the earliest qualifying event becomes the new
    * anchor — the standard product-analytics funnel, not a mere
    * set-intersection of event types). Output is one row per stage with
    * the surviving-user count and the step conversion rate.
    *
    * Scale: each stage is a filtered min-aggregate shuffled by user_id
    * (map-side combined, O(users) rows out), then a user-keyed join
    * against the previous stage's O(users) anchor frame — same key, so
    * AQE plans them shuffle-local; the final counts are single-row
    * aggregates cross-joined broadcast. Input size touches only the
    * three pruned scans (one per stage filter; a single-scan variant
    * would trade that for a wider shuffle of all three event types).
    */
  def winFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.agg(count(lit(1)).as("n1"))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(s3.agg(count(lit(1)).as("n3")))
      .select(expr(
        """stack(3,
          |  '1_view', n1, CAST(NULL AS DOUBLE),
          |  '2_click', n2, round(n2 / n1, 6),
          |  '3_purchase', n3, round(n3 / n2, 6)
          |) AS (stage, n_users, step_rate)""".stripMargin))
      .orderBy("stage")
  }

  val winFunnelOracle: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |    WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |    JOIN s1 ON s1.user_id = e.user_id
      |    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |    JOIN s2 ON s2.user_id = e.user_id
      |    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
      |c AS (SELECT (SELECT count(*) FROM s1) AS n1,
      |             (SELECT count(*) FROM s2) AS n2,
      |             (SELECT count(*) FROM s3) AS n3)
      |SELECT stage, n_users, step_rate FROM (
      |  SELECT '1_view' AS stage, n1 AS n_users,
      |    CAST(NULL AS DOUBLE) AS step_rate FROM c
      |  UNION ALL SELECT '2_click', n2, round(n2 / n1, 6) FROM c
      |  UNION ALL SELECT '3_purchase', n3, round(n3 / n2, 6) FROM c)
      |ORDER BY stage""".stripMargin

  /** EXPONENTIALLY WEIGHTED MOVING AVERAGE per series — the smoothing
    * pass monitoring and trend detection layer over noisy daily
    * metrics (and the classic "order-sensitive recursion that doesn't
    * fit SQL" strawman). The recursion y_i = αx_i + (1-α)y_{i-1} is
    * replaced by its TRUNCATED KERNEL: a normalized weighted sum of
    * the last K observations with weights (1-α)^j. Truncation at K=16
    * bounds the dropped tail mass at (1-α)^16 ≈ 0.3% of total weight
    * (α=0.3) — and it is exactly what makes the operator scale-safe:
    * a bounded ROWS window per series key instead of an unbounded
    * sequential scan, so a 100 TB history smooths with one shuffle by
    * series key and no cross-partition state. Normalizing by the
    * realized weight sum (pandas `adjust=True`) makes the series head
    * well-defined without an initial-condition convention.
    *
    * Per-day means are rounded to 6dp on BOTH engines before entering
    * the kernel, so the smoothed values derive from identical inputs;
    * the oracle spells the same kernel as a bounded range self-join.
    */
  /** AUTOCORRELATION (ACF) of the daily event-count series at lags
    * 1..3 — the first diagnostic a forecasting pipeline computes
    * (seasonality/AR order detection; the lag-k Pearson correlation
    * between the series and its k-shifted self). Heavy work is the
    * partial-aggregated daily rollup; the lead window and the three
    * `corr` aggregates then run over the DAYS-sized frame — at 100 TB
    * the series is still one row per day, so the unpartitioned window
    * is a deliberate metadata-frame operation, never an event-level
    * sort (same discipline as [[tsEwma]]'s per-type windows). Both
    * engines skip null (tail) pairs in `corr` and compute the same
    * scale-invariant r, so 6-dp rounding hash-matches.
    */
  def tsAcf(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
    val w = Window.orderBy("d")
    val shifted = daily
      .withColumn("n1", lead("n", 1).over(w))
      .withColumn("n2", lead("n", 2).over(w))
      .withColumn("n3", lead("n", 3).over(w))
    shifted
      .select(col("n"), expr(
        "stack(3, 1, n1, 2, n2, 3, n3) AS (lag, nk)"))
      .groupBy("lag")
      .agg(count(col("nk")).as("n_pairs"),
        round(corr(col("n"), col("nk")), 6).as("acf"))
      .orderBy("lag")
  }

  val tsAcfOracle: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS d,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1
      |), shifted AS (
      |  SELECT n,
      |    lead(n, 1) OVER (ORDER BY d) AS n1,
      |    lead(n, 2) OVER (ORDER BY d) AS n2,
      |    lead(n, 3) OVER (ORDER BY d) AS n3
      |  FROM daily
      |), long AS (
      |  SELECT 1 AS lag, n, n1 AS nk FROM shifted
      |  UNION ALL SELECT 2, n, n2 FROM shifted
      |  UNION ALL SELECT 3, n, n3 FROM shifted
      |)
      |SELECT lag, count(nk) AS n_pairs, ROUND(corr(n, nk), 6) AS acf
      |FROM long GROUP BY lag ORDER BY lag""".stripMargin

  /** 7-DAY ROLLING MEDIAN of the daily event count — the robust
    * smoother ([[tsEwma]]'s outlier-immune sibling: a single spike
    * day moves an EWMA but not a median). Exact interpolated
    * `percentile` as a window aggregate over the trailing 7-row
    * frame; both engines interpolate identically on the sorted frame
    * so 2-dp rounding hash-matches. Heavy work is the
    * partial-aggregated daily rollup; the windowed median then sorts
    * 7-element frames over the O(days) series — a metadata-frame op
    * at any corpus size.
    */
  def tsRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    daily
      .withColumn("med7", round(expr("percentile(n, 0.5)").over(w), 2))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("med7"))
      .orderBy("day")
  }

  val tsRollingMedianOracle: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS d,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1
      |)
      |SELECT strftime(d, '%Y-%m-%d') AS day, n,
      |  ROUND(quantile_cont(n, 0.5) OVER (
      |    ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
      |    AS med7
      |FROM daily ORDER BY day""".stripMargin

  /** CROSS-correlation (CCF) between the daily click and purchase
    * count series at lags −2..+2 — [[tsAcf]]'s two-series sibling and
    * the lead/lag-relationship diagnostic (does click volume lead
    * purchase volume?): corr(click_t, purchase_{t+k}), negative k =
    * purchases lead. Same scale shape as the ACF: two
    * partial-aggregated daily rollups pivoted to one row per day,
    * lead/lag windows + five `corr` aggregates over the O(days)
    * frame; the unpartitioned window is a metadata-frame op at any
    * corpus size.
    */
  def tsCcf(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_trunc("DAY", col("ts")).as("d"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("double").as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("double").as("y"))
    val w = Window.orderBy("d")
    val shifted = daily
      .withColumn("ym2", lag("y", 2).over(w))
      .withColumn("ym1", lag("y", 1).over(w))
      .withColumn("yp1", lead("y", 1).over(w))
      .withColumn("yp2", lead("y", 2).over(w))
    shifted
      .select(col("x"), expr(
        "stack(5, -2, ym2, -1, ym1, 0, y, 1, yp1, 2, yp2) AS (lag, yk)"))
      .groupBy("lag")
      .agg(count(col("yk")).as("n_pairs"),
        round(corr(col("x"), col("yk")), 6).as("ccf"))
      .orderBy("lag")
  }

  val tsCcfOracle: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS d,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1
      |), shifted AS (
      |  SELECT x, y,
      |    lag(y, 2) OVER w AS ym2, lag(y, 1) OVER w AS ym1,
      |    lead(y, 1) OVER w AS yp1, lead(y, 2) OVER w AS yp2
      |  FROM daily WINDOW w AS (ORDER BY d)
      |), long AS (
      |  SELECT -2 AS lag, x, ym2 AS yk FROM shifted
      |  UNION ALL SELECT -1, x, ym1 FROM shifted
      |  UNION ALL SELECT 0, x, y FROM shifted
      |  UNION ALL SELECT 1, x, yp1 FROM shifted
      |  UNION ALL SELECT 2, x, yp2 FROM shifted
      |)
      |SELECT lag, count(yk) AS n_pairs, ROUND(corr(x, yk), 6) AS ccf
      |FROM long GROUP BY lag ORDER BY lag""".stripMargin

  def tsEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("d"))
      .agg(round(avg("value"), 6).as("x"))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd")
        .as("day"), col("x"))
    val lastK = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-15, 0)
    daily
      .withColumn("xs", collect_list("x").over(lastK))
      .withColumn("ewma", expr(
        """round(
          |  aggregate(xs,
          |    struct(CAST(0.0 AS DOUBLE) AS s, CAST(0.0 AS DOUBLE) AS ws,
          |           0 AS i),
          |    (acc, x) -> struct(
          |      acc.s + x * pow(0.7, size(xs) - 1 - acc.i),
          |      acc.ws + pow(0.7, size(xs) - 1 - acc.i),
          |      acc.i + 1),
          |    acc -> acc.s / acc.ws), 6)""".stripMargin))
      .select(col("event_type"), col("day"), col("x"), col("ewma"))
      .orderBy("event_type", "day")
  }

  val tsEwmaOracle: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    ROUND(avg(value), 6) AS x
      |  FROM events GROUP BY 1, 2
      |), r AS (
      |  SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
      |  FROM d
      |)
      |SELECT a.event_type, a.day, a.x,
      |  ROUND(sum(b.x * pow(0.7, a.rn - b.rn)) /
      |        sum(pow(0.7, a.rn - b.rn)), 6) AS ewma
      |FROM r a JOIN r b ON a.event_type = b.event_type
      |  AND b.rn BETWEEN a.rn - 15 AND a.rn
      |GROUP BY a.event_type, a.day, a.x
      |ORDER BY a.event_type, a.day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_resample" -> tsResample,
    "ts_ewma" -> tsEwma,
    "ts_interpolate" -> tsInterpolate,
    "ts_anomaly" -> tsAnomaly,
    "ts_changepoint" -> tsChangepoint,
    "ts_seasonal" -> tsSeasonal,
    "ts_acf" -> tsAcf,
    "ts_ccf" -> tsCcf,
    "ts_rolling_median" -> tsRollingMedian,
    "ts_forecast" -> tsForecast,
    "win_retention" -> winRetention,
    "win_reach" -> winReach,
    "win_funnel" -> winFunnel,
    "win_pattern_burst" -> winPatternBurst,
    "agg_corr" -> aggCorr,
    "agg_regression" -> aggRegression,
    "profile_entropy" -> profileEntropy)

  def oracles: Map[String, String] = Map(
    "ts_resample" -> tsResampleOracle,
    "ts_ewma" -> tsEwmaOracle,
    "ts_interpolate" -> tsInterpolateOracle,
    "ts_anomaly" -> tsAnomalyOracle,
    "ts_changepoint" -> tsChangepointOracle,
    "ts_seasonal" -> tsSeasonalOracle,
    "ts_acf" -> tsAcfOracle,
    "ts_ccf" -> tsCcfOracle,
    "ts_rolling_median" -> tsRollingMedianOracle,
    "ts_forecast" -> tsForecastOracle,
    "win_retention" -> winRetentionOracle,
    "win_reach" -> winReachOracle,
    "win_funnel" -> winFunnelOracle,
    "win_pattern_burst" -> winPatternBurstOracle,
    "agg_corr" -> aggCorrOracle,
    "agg_regression" -> aggRegressionOracle,
    "profile_entropy" -> profileEntropyOracle)
}
