package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.catalog.Warehouse
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier B catalog + source/sink demonstration queries.
  *
  * `catalog_ddl` replays the reference's lakehouse bootstrap
  * (init_for_test.py:86-101): conditional namespace + two parquet
  * tables + SHOW TABLES LIKE existence checks, re-run idempotently.
  *
  * `sink_formats` exercises the write-format matrix (B2 append writes
  * + the packaged-but-unused ORC capability, SURVEY §1.2): the same
  * frame round-trips through parquet / csv / json / orc and each
  * read-back must agree with the source on count and checksum.
  * (No spark-avro datasource jar ships in this environment — only
  * avro-core — so avro is the one matrix row that stays out.)
  */
object CatalogQueries {

  def catalogDdl(spark: SparkSession, sfDir: String): DataFrame = {
    val whDir = graft.Scratch.dir("graft-cat-wh-")
    Warehouse.createNamespaceIfNotExists(spark, "cdc",
      whDir.resolve("cdc").toString)
    val account = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_name").as("email"))
    val product = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("product_id"), col("p_name").as("name"))
    // Idempotent bootstrap, run twice on purpose (IF NOT EXISTS path).
    (1 to 2).foreach { _ =>
      Warehouse.createTableIfNotExists(spark, "cdc.commerce_account",
        account.schema, whDir.resolve("cdc/commerce_account").toString)
      Warehouse.createTableIfNotExists(spark, "cdc.commerce_product",
        product.schema, whDir.resolve("cdc/commerce_product").toString)
    }
    val shown = Warehouse.showTablesLike(spark, "cdc", "commerce_*")
      .select(col("tableName").as("table_name"))
    shown.withColumn("exists_probe",
      lit(Warehouse.tableExists(spark, "cdc", "commerce_account") &&
        Warehouse.tableExists(spark, "cdc", "commerce_product") &&
        !Warehouse.tableExists(spark, "cdc", "commerce_nope")))
      .orderBy("table_name")
  }

  val catalogDdlOracle: String =
    """SELECT 'commerce_account' AS table_name, true AS exists_probe
      |UNION ALL
      |SELECT 'commerce_product', true
      |ORDER BY table_name""".stripMargin

  def sinkFormats(spark: SparkSession, sfDir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-sink-")
    // Pre-rounded projection so text formats (csv/json) serialize the
    // exact same value the checksum compares.
    val src = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("bal"))
    val formats = Seq("parquet", "csv", "json", "orc")
    val perFmt = formats.map { fmt =>
      val dir = out.resolve(fmt).toString
      // B2 — append-mode write, split in two appends like the
      // reference's insert waves (test_cdc.py:55-73).
      src.filter(col("c_custkey") % 2 === 0)
        .write.mode("append").format(fmt)
        .option("header", "true").save(dir)
      src.filter(col("c_custkey") % 2 =!= 0)
        .write.mode("append").format(fmt)
        .option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .options(if (fmt == "csv") Map("header" -> "true")
                 else Map.empty[String, String])
        .schema(src.schema).load(dir)
      back.agg(lit(fmt).as("fmt"), count(lit(1)).as("n"),
        round(sum("bal"), 2).as("bal_sum"))
    }
    perFmt.reduce(_.unionAll(_)).orderBy("fmt")
  }

  val sinkFormatsOracle: String =
    """WITH s AS (SELECT count(*) AS n,
      |  ROUND(sum(ROUND(c_acctbal, 2)), 2) AS bal_sum FROM customer)
      |SELECT fmt, n, bal_sum FROM s,
      |  (SELECT unnest(['csv','json','orc','parquet']) AS fmt)
      |ORDER BY fmt""".stripMargin

  /** ONE-PASS table profiling — the data-quality sweep every ingest
    * runs before trusting a new drop: per column, non-null count,
    * exact distinct count, and min/max, for a mixed numeric / string /
    * timestamp column set, emitted long-format (one row per column).
    *
    * Shape: ONE scan, an in-row explode into (col_name, value) pairs
    * (numerics/timestamps canonicalized to double — timestamps as
    * epoch micros — strings kept as strings), then TWO HASH
    * aggregations: a map-side-combined count per distinct
    * (column, value) pair — the hot combine, since value frequency is
    * high — and a per-column rollup over the tiny distinct frame that
    * derives everything at once (non-null count = sum of pair counts,
    * distinct count = pair count, min/max = min/max over the distinct
    * values). The naive spelling — one agg with four exact
    * COUNT(DISTINCT)s plus min/max(string) — plans Expand into a
    * SORT-based aggregate (string min/max has no mutable hash buffer),
    * i.e. a global sort of 4× the table: measured 5.1 s vs 0.9 s at
    * sf0.1 for this shape. The naive per-column loop is k full scans.
    * Swap the pair count for `approx_count_distinct` per column when
    * ±2% suffices and values are near-unique (the pair frame stops
    * compressing); the two-stage shape itself holds at 100 TB because
    * only (column, distinct-value, count) triples cross the shuffle.
    */
  def profileTable(spark: SparkSession, sfDir: String): DataFrame = {
    def num(name: String, c: Column) = struct(
      lit(name).as("col_name"), c.cast("double").as("v_num"),
      lit(null).cast("string").as("v_str"))
    def str(name: String, c: Column) = struct(
      lit(name).as("col_name"), lit(null).cast("double").as("v_num"),
      c.as("v_str"))
    val present = col("v_num").isNotNull || col("v_str").isNotNull
    Tables.load(spark, sfDir, "lineitem")
      .select(explode(array(
        num("l_partkey", col("l_partkey")),
        num("l_quantity", col("l_quantity")),
        // fixture timestamps are NTZ; session tz is UTC so the cast is
        // a no-op reinterpretation (Relational.tsMicros precedent).
        num("l_shipdate",
          unix_micros(col("l_shipdate").cast("timestamp"))),
        str("l_returnflag", col("l_returnflag")))).as("p"))
      .select("p.*")
      .groupBy("col_name", "v_num", "v_str")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("col_name")
      .agg(
        sum(when(present, col("cnt")).otherwise(0L)).as("n_nonnull"),
        count(when(present, lit(1))).as("n_distinct"),
        min("v_num").as("min_num"), max("v_num").as("max_num"),
        min("v_str").as("min_str"), max("v_str").as("max_str"))
      .orderBy("col_name")
  }

  val profileTableOracle: String =
    """SELECT 'l_partkey' AS col_name, count(l_partkey) AS n_nonnull,
      |  count(DISTINCT l_partkey) AS n_distinct,
      |  CAST(min(l_partkey) AS DOUBLE) AS min_num,
      |  CAST(max(l_partkey) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', count(l_quantity), count(DISTINCT l_quantity),
      |  CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
      |  NULL, NULL
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_shipdate', count(l_shipdate), count(DISTINCT l_shipdate),
      |  CAST(epoch_us(min(l_shipdate)) AS DOUBLE),
      |  CAST(epoch_us(max(l_shipdate)) AS DOUBLE), NULL, NULL
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_returnflag', count(l_returnflag),
      |  count(DISTINCT l_returnflag), NULL, NULL,
      |  min(l_returnflag), max(l_returnflag)
      |FROM lineitem
      |ORDER BY col_name""".stripMargin

  /** SKEW PROFILING — the diagnostic a 100 TB pipeline runs BEFORE
    * choosing a join strategy: per-key frequency distribution of the
    * events stream's user_id (count percentiles, the hottest key and
    * its share). `join_skew_salted` is the cure; this is the test that
    * tells you whether to apply it — a skew_ratio (max/median key
    * frequency) in the hundreds means the vanilla shuffle join will
    * strand one task with the hot key's entire partition.
    *
    * Shape: one map-side-combined count per key, then scalar
    * aggregates over the (key, cnt) frame — the second pass is
    * key-cardinality-sized, not data-sized. The hottest key is the
    * max key id among keys at the max count (deterministic tie-break),
    * via a broadcast of the 1-row max — a packed (cnt·2^k + key) max
    * would silently misorder once key ids exceed 2^k, which a 100 TB
    * id domain does.
    */
  def profileSkew(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    counts.crossJoin(broadcast(counts.agg(max("cnt").as("top_cnt"))))
      .agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"),
        round(expr("percentile(cnt, 0.5)"), 6).as("p50_cnt"),
        round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"),
        round(max("cnt") / expr("percentile(cnt, 0.5)"), 6).as("skew_ratio"),
        max(when(col("cnt") === col("top_cnt"), col("user_id")))
          .as("hottest_key"))
  }

  val profileSkewOracle: String =
    """WITH c AS (
      |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
      |)
      |SELECT count(*) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  max(cnt) AS max_cnt,
      |  ROUND(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
      |  ROUND(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
      |  ROUND(max(cnt) / quantile_cont(cnt, 0.5), 6) AS skew_ratio,
      |  (SELECT max(user_id) FROM c
      |   WHERE cnt = (SELECT max(cnt) FROM c)) AS hottest_key
      |FROM c""".stripMargin

  /** EQUI-WIDTH HISTOGRAMS — the value-distribution statistic a CBO's
    * selectivity estimator and a file-skipping layer consume beyond
    * [[profileTable]]'s NDV/bounds: 16 buckets per numeric column, all
    * columns in ONE data-sized scan. Bounds come from a 1-row metadata
    * aggregate collected and re-embedded as literals (the zorder
    * quantizer precedent), so the bucket id, lo and hi are scan-local
    * in-row arithmetic; the per-(column, bucket) counts are map-side
    * combined — at most cols×16 rows cross the shuffle regardless of
    * table size. At 100 TB the bounds pass reads parquet footer stats
    * instead of scanning; the shape is otherwise unchanged.
    */
  def profileHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val nb = 16
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val li = Tables.load(spark, sfDir, "lineitem")
    val boundCols = cols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    val b = li.agg(boundCols.head, boundCols.tail: _*).head
    val entries = cols.zipWithIndex.map { case (c, i) =>
      val lo = b.getDouble(2 * i)
      val width = (b.getDouble(2 * i + 1) - lo) / nb
      // Fixture lineitem is non-null throughout; the max value lands in
      // the last bucket via the least() clamp.
      val bucket = least(floor((col(c) - lo) / width), lit(nb - 1))
        .cast("int")
      struct(lit(c).as("col_name"), bucket.as("bucket"),
        round(lit(lo) + bucket.cast("double") * width, 6).as("lo"),
        round(lit(lo) + (bucket + 1).cast("double") * width, 6).as("hi"))
    }
    li.select(explode(array(entries: _*)).as("h"))
      .select("h.*")
      .groupBy("col_name", "bucket", "lo", "hi")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("col_name", "bucket")
  }

  val profileHistogramOracle: String =
    """WITH b AS (
      |  SELECT min(l_quantity) AS q_lo, max(l_quantity) AS q_hi,
      |         min(l_extendedprice) AS e_lo, max(l_extendedprice) AS e_hi,
      |         min(l_discount) AS d_lo, max(l_discount) AS d_hi
      |  FROM lineitem
      |), raw AS (
      |  SELECT 'l_quantity' AS col_name,
      |    CAST(LEAST(FLOOR((l_quantity - q_lo) / ((q_hi - q_lo) / 16)),
      |      15) AS INT) AS bucket,
      |    q_lo AS lo0, (q_hi - q_lo) / 16 AS w
      |  FROM lineitem, b
      |  UNION ALL
      |  SELECT 'l_extendedprice',
      |    CAST(LEAST(FLOOR((l_extendedprice - e_lo) / ((e_hi - e_lo) / 16)),
      |      15) AS INT),
      |    e_lo, (e_hi - e_lo) / 16
      |  FROM lineitem, b
      |  UNION ALL
      |  SELECT 'l_discount',
      |    CAST(LEAST(FLOOR((l_discount - d_lo) / ((d_hi - d_lo) / 16)),
      |      15) AS INT),
      |    d_lo, (d_hi - d_lo) / 16
      |  FROM lineitem, b
      |)
      |SELECT col_name, bucket, ROUND(lo0 + bucket * w, 6) AS lo,
      |       ROUND(lo0 + (bucket + 1) * w, 6) AS hi, count(*) AS cnt
      |FROM raw GROUP BY col_name, bucket, lo0, w
      |ORDER BY col_name, bucket""".stripMargin

  /** DISTRIBUTION-DRIFT MONITOR (PSI) — the training-data freshness
    * check every production corpus pipeline runs before a retrain:
    * the Population Stability Index of `o_totalprice` between a
    * reference population (1996 orders) and the current one (1997),
    * over 10 equal-width bins anchored on the REFERENCE's own bounds
    * (fixed-edge bins, not quantiles — quantile algorithms differ
    * across engines, subtraction and floor do not). Counts are
    * Laplace-smoothed (+1 per bin) so an empty bin contributes a
    * finite term instead of ±inf, and every probability is derived
    * then rounded per the publish-then-compare discipline.
    *
    * PSI reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    * population changed — the per-bin terms localize WHERE the mass
    * moved, which is what makes the report actionable. The fixture's
    * years are near-identically distributed (PSI 0.004), so the
    * current population carries an ENGINEERED drift (the zonemap-
    * incremental discipline): +50 % price on every third order —
    * total PSI lands at ~0.1 with >80 % of it concentrated in the
    * top bin, exactly the tail-inflation a pricing-pipeline bug
    * produces and exactly what the per-bin report pinpoints.
    *
    * Scale: one metadata aggregate for the reference bounds, one
    * binned conditional-count aggregate over a single scan of both
    * populations (map-side combined, bin-cardinality output), and a
    * broadcast of the 1-row totals — nothing holds more than
    * |bins| rows however large the table.
    */
  /** K-ANONYMITY REPORT — the release-governance check a training-data
    * pipeline runs before publishing a slice: over the quasi-identifier
    * tuple (nation, market segment), how many equivalence classes fall
    * below k=5 members and how many rows those classes expose. A
    * below-k class means its rows are re-identifiable by the QI tuple
    * alone — the set a `cdc_column_mask`-style generalization or a
    * [[graft.cdc.StateStore.purgeKeys]] erasure must treat before
    * release. One hash aggregate on the QI tuple; the report is
    * class-cardinality-sized however large the table.
    */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.load(spark, sfDir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    g.agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("n")).as("min_group_size"))
      .select(lit(5).as("k"), col("n_groups"), col("n_violating_groups"),
        col("n_rows_at_risk"), col("min_group_size"))
  }

  val kAnonymityOracle: String =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS n
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT CAST(5 AS INTEGER) AS k, count(*) AS n_groups,
      |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_groups,
      |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  CAST(min(n) AS BIGINT) AS min_group_size
      |FROM g""".stripMargin

  /** L-DIVERSITY REPORT — [[kAnonymity]]'s companion check: a class
    * can be large (k-anonymous) yet still leak if every member shares
    * the same SENSITIVE value. Per quasi-identifier class, the number
    * of distinct sensitive-value buckets (account balance coarsened to
    * negative/mid/high); classes below l=3 expose their members'
    * balance band by QI membership alone. Same shape as k-anonymity:
    * one aggregate over the QI tuple (the distinct-count is a partial
    * aggregate over (QI, bucket) first), class-cardinality-sized
    * report.
    */
  def lDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = when(col("c_acctbal") < 0, "neg")
      .when(col("c_acctbal") < 5000, "mid").otherwise("high")
    val cls = Tables.load(spark, sfDir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(countDistinct(bucket).as("l"), count(lit(1)).as("n"))
    cls.agg(count(lit(1)).as("n_groups"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("l") < 3, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("l")).as("min_diversity"))
      .select(lit(3).as("l_req"), col("n_groups"),
        col("n_violating_groups"), col("n_rows_at_risk"),
        col("min_diversity"))
  }

  val lDiversityOracle: String =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
      |                        WHEN c_acctbal < 5000 THEN 'mid'
      |                        ELSE 'high' END) AS l,
      |    count(*) AS n
      |  FROM customer GROUP BY 1, 2
      |)
      |SELECT CAST(3 AS INTEGER) AS l_req, count(*) AS n_groups,
      |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_groups,
      |  CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  CAST(min(l) AS BIGINT) AS min_diversity
      |FROM cls""".stripMargin

  /** T-CLOSENESS REPORT (VERDICT r13 missing #3) — the third member of
    * the release-governance family, making the check [[lDiversity]]
    * can't: a class can be diverse (all three balance bands present)
    * yet SKEWED — 95 % 'high' in a corpus that is 46 % 'high' still
    * tells an attacker a class member is almost surely high-balance.
    * Per quasi-identifier class, the distance between the class's
    * sensitive-band distribution and the corpus's; for a nominal
    * sensitive attribute the Earth-Mover's Distance of Li et al. 2007
    * reduces to total variation, computed here without materializing
    * absent bands: with p over the class's PRESENT bands and q the
    * corpus mass on those bands, TVD = (Σ|p−q| + (1 − Σq)) / 2.
    *
    * The fixture's balances are nation/segment-independent, so at
    * large class sizes every honest distance converges to ~0 — the
    * current population therefore carries an ENGINEERED leak (the
    * profile_drift discipline): +6000.0 on (nation%5=0, AUTOMOBILE)
    * pushes those five classes all-'high' (distance ≈ 0.52 at every
    * sf, the exact localizable finding the report exists to surface)
    * while honest classes stay below t=0.2 once class sizes outgrow
    * sampling noise.
    *
    * Scale: one (QI, band) hash aggregate, one QI rollup of it, one
    * 3-row corpus broadcast — the report is class-cardinality-sized
    * however large the table, like its two siblings.
    */
  /** Per-class t-closeness frame (test hook): one row per QI class
    * with its size and its rounded distance to the corpus.
    */
  private[queries] def tClosenessClasses(spark: SparkSession,
      sfDir: String): DataFrame = {
    val bal = when(col("c_nationkey") % 5 === 0 &&
        col("c_mktsegment") === "AUTOMOBILE",
      col("c_acctbal") + 6000.0).otherwise(col("c_acctbal"))
    val band = when(bal < 0, "neg").when(bal < 5000, "mid")
      .otherwise("high")
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("b"))
    val cb = c.groupBy("c_nationkey", "c_mktsegment", "b")
      .agg(count(lit(1)).as("nb"))
    val corpus = c.groupBy("b").agg(count(lit(1)).as("nall"))
    val q = corpus.crossJoin(broadcast(corpus.agg(
        sum("nall").cast("double").as("ct"))))
      .select(col("b"), (col("nall") / col("ct")).as("q"))
    val cls = cb.groupBy("c_nationkey", "c_mktsegment")
      .agg(sum("nb").as("cn"))
    cb.join(broadcast(q), "b")
      .join(cls, Seq("c_nationkey", "c_mktsegment"))
      .groupBy("c_nationkey", "c_mktsegment", "cn")
      .agg(sum(abs(col("nb").cast("double") / col("cn") - col("q")))
          .as("s1"),
        sum("q").as("s2"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("cn"),
        round((col("s1") + 1.0 - col("s2")) / 2.0, 6).as("dist"))
  }

  def tCloseness(spark: SparkSession, sfDir: String): DataFrame =
    tClosenessClasses(spark, sfDir)
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("dist") > 0.2, 1L).otherwise(0L))
          .as("n_violating_groups"),
        sum(when(col("dist") > 0.2, col("cn")).otherwise(0L))
          .as("n_rows_at_risk"),
        max(col("dist")).as("max_distance"))
      .select(lit(0.2).as("t"), col("n_groups"), col("n_violating_groups"),
        col("n_rows_at_risk"), col("max_distance"))

  val tClosenessOracle: String =
    """WITH c AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CASE WHEN bal < 0 THEN 'neg'
      |         WHEN bal < 5000 THEN 'mid' ELSE 'high' END AS b
      |  FROM (SELECT c_nationkey, c_mktsegment,
      |          CASE WHEN c_nationkey % 5 = 0
      |                AND c_mktsegment = 'AUTOMOBILE'
      |               THEN c_acctbal + 6000.0 ELSE c_acctbal END AS bal
      |        FROM customer) t
      |), cb AS (
      |  SELECT c_nationkey, c_mktsegment, b, count(*) AS nb
      |  FROM c GROUP BY 1, 2, 3
      |), q AS (
      |  SELECT b, count(*) / CAST((SELECT count(*) FROM c) AS DOUBLE) AS q
      |  FROM c GROUP BY 1
      |), cls AS (
      |  SELECT c_nationkey, c_mktsegment, sum(nb) AS cn
      |  FROM cb GROUP BY 1, 2
      |), d AS (
      |  SELECT cb.c_nationkey, cb.c_mktsegment, cls.cn,
      |    sum(abs(CAST(cb.nb AS DOUBLE) / cls.cn - q.q)) AS s1,
      |    sum(q.q) AS s2
      |  FROM cb JOIN q USING (b)
      |    JOIN cls USING (c_nationkey, c_mktsegment)
      |  GROUP BY 1, 2, 3
      |), dist AS (
      |  SELECT cn, round((s1 + 1.0 - s2) / 2.0, 6) AS dist FROM d
      |)
      |SELECT CAST(0.2 AS DOUBLE) AS t, count(*) AS n_groups,
      |  CAST(sum(CASE WHEN dist > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_groups,
      |  CAST(sum(CASE WHEN dist > 0.2 THEN cn ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  max(dist) AS max_distance
      |FROM dist""".stripMargin

  def profileDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val nb = 10
    val orders = Tables.load(spark, sfDir, "orders")
    val b = orders.filter(year(col("o_orderdate")) === 1996)
      .agg(min("o_totalprice").cast("double"),
        max("o_totalprice").cast("double")).head()
    val lo = b.getDouble(0)
    val w = (b.getDouble(1) - lo) / nb
    val price = when(col("o_orderkey") % 3 === 0 &&
        year(col("o_orderdate")) === 1997,
      col("o_totalprice") * 1.5).otherwise(col("o_totalprice"))
    val binned = orders
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(
        greatest(least(floor((price - lo) / w), lit(nb - 1)),
          lit(0)).cast("int").as("bin"),
        year(col("o_orderdate")).as("yr"))
    val c = binned.groupBy("bin").agg(
      sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("n_cur"))
    val t = c.agg(sum("n_ref").cast("double").as("nr"),
      sum("n_cur").cast("double").as("nc"))
    val pRef = (col("n_ref") + 1) / (col("nr") + nb)
    val pCur = (col("n_cur") + 1) / (col("nc") + nb)
    c.crossJoin(broadcast(t))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
      .orderBy("bin")
  }

  val profileDriftOracle: String =
    """WITH b AS (
      |  SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
      |         CAST(max(o_totalprice) AS DOUBLE) AS hi
      |  FROM orders WHERE year(o_orderdate) = 1996
      |), binned AS (
      |  SELECT CAST(GREATEST(LEAST(FLOOR((
      |      CASE WHEN o_orderkey % 3 = 0 AND year(o_orderdate) = 1997
      |           THEN o_totalprice * 1.5 ELSE o_totalprice END
      |      - lo) / ((hi - lo) / 10)), 9), 0) AS INT) AS bin,
      |    year(o_orderdate) AS yr
      |  FROM orders, b WHERE year(o_orderdate) IN (1996, 1997)
      |), c AS (
      |  SELECT bin,
      |    CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_ref,
      |    CAST(sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_cur
      |  FROM binned GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(n_ref) AS DOUBLE) AS nr,
      |         CAST(sum(n_cur) AS DOUBLE) AS nc
      |  FROM c
      |)
      |SELECT bin, n_ref, n_cur,
      |  ROUND((n_ref + 1) / (nr + 10), 6) AS p_ref,
      |  ROUND((n_cur + 1) / (nc + 10), 6) AS p_cur,
      |  ROUND(((n_cur + 1) / (nc + 10) - (n_ref + 1) / (nr + 10)) *
      |    ln(((n_cur + 1) / (nc + 10)) / ((n_ref + 1) / (nr + 10))), 6)
      |    AS psi_term
      |FROM c, t ORDER BY bin""".stripMargin

  /** DATA-QUALITY EXPECTATIONS — the Delta CHECK-constraint /
    * Great-Expectations validation report as one operator: six rules
    * over `orders` (positivity, date range, key uniqueness, FK null
    * rate, FK integrity against `customer`, domain membership), each
    * emitting (rule, violation count, pass). Five rules fold into ONE
    * conditional-count aggregate over a single scan (violations are
    * `count(when(...))` buffers — adding a rule adds a buffer, not a
    * scan); the FK rule is a broadcast LEFT ANTI join (dim-sized
    * build side; at 100 TB a non-broadcastable dim shuffles both
    * sides on the key like any join). The date-range rule genuinely
    * FAILS on the fixture (orders run past 1998) — the report shape
    * with mixed pass/fail is the point: a pipeline gates on
    * `pass = false` rows, not on a boolean for the whole table.
    */
  def profileExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val scan = orders.agg(
      count(when(col("o_totalprice").isNull ||
        !(col("o_totalprice") > 0), lit(1))).as("v_price"),
      count(when(col("o_orderdate").isNull ||
        col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
        col("o_orderdate") > lit("1998-12-31").cast("timestamp"), lit(1)))
        .as("v_date"),
      (count(lit(1)) - countDistinct("o_orderkey")).as("v_unique"),
      count(when(col("o_custkey").isNull, lit(1))).as("v_nullfk"),
      count(when(!col("o_orderstatus").isin("F", "O", "P"), lit(1)))
        .as("v_domain"))
    val fk = orders.join(broadcast(cust),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk"))
    def rule(name: String, v: Column) = struct(
      lit(name).as("rule_name"), v.as("n_violations"),
      (v === 0L).as("pass"))
    scan.crossJoin(fk)
      .select(explode(array(
        rule("o_custkey_fk_customer", col("v_fk")),
        rule("o_custkey_not_null", col("v_nullfk")),
        rule("o_orderdate_in_range", col("v_date")),
        rule("o_orderkey_unique", col("v_unique")),
        rule("o_orderstatus_in_domain", col("v_domain")),
        rule("o_totalprice_positive", col("v_price")))).as("r"))
      .select("r.*")
      .orderBy("rule_name")
  }

  val profileExpectationsOracle: String =
    """WITH s AS (
      |  SELECT
      |    count(CASE WHEN o_totalprice IS NULL
      |               OR NOT (o_totalprice > 0) THEN 1 END) AS v_price,
      |    count(CASE WHEN o_orderdate IS NULL
      |               OR o_orderdate < TIMESTAMP '1992-01-01'
      |               OR o_orderdate > TIMESTAMP '1998-12-31'
      |          THEN 1 END) AS v_date,
      |    count(*) - count(DISTINCT o_orderkey) AS v_unique,
      |    count(CASE WHEN o_custkey IS NULL THEN 1 END) AS v_nullfk,
      |    count(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
      |          THEN 1 END) AS v_domain
      |  FROM orders
      |), f AS (
      |  SELECT count(*) AS v_fk FROM orders o
      |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |)
      |SELECT 'o_custkey_fk_customer' AS rule_name, v_fk AS n_violations,
      |  v_fk = 0 AS pass FROM f
      |UNION ALL SELECT 'o_custkey_not_null', v_nullfk, v_nullfk = 0 FROM s
      |UNION ALL SELECT 'o_orderdate_in_range', v_date, v_date = 0 FROM s
      |UNION ALL SELECT 'o_orderkey_unique', v_unique, v_unique = 0 FROM s
      |UNION ALL SELECT 'o_orderstatus_in_domain', v_domain,
      |  v_domain = 0 FROM s
      |UNION ALL SELECT 'o_totalprice_positive', v_price, v_price = 0 FROM s
      |ORDER BY rule_name""".stripMargin

  /** PIPELINE OBSERVABILITY via `Dataset.observe` — named metrics
    * collected AS A SIDE EFFECT of a real job, with zero extra scans:
    * the write below is a quality-filtered projection of lineitem
    * (the shape every curation job has), and the observation rides
    * that single pass — row count, quantity sum, and the filtered-out
    * count all materialize in the driver's listener without a second
    * aggregate job. At 100 TB this is the difference between "run the
    * pipeline, then re-scan to count what it did" and getting the
    * audit numbers for free; the returned frame IS the observed
    * metrics row, oracle-checked against a from-scratch aggregate.
    * (`observe` requires a completed action — the noop write — so the
    * metrics reflect exactly the rows the job really processed.)
    */
  def profileObserve(spark: SparkSession, sfDir: String): DataFrame = {
    val observation = new org.apache.spark.sql.Observation()
    Tables.load(spark, sfDir, "lineitem")
      .observe(observation,
        count(lit(1)).as("rows_in"),
        count(when(col("l_quantity") >= 25, lit(1))).as("rows_kept"),
        round(sum(when(col("l_quantity") >= 25, col("l_quantity"))), 2)
          .as("qty_kept"))
      .filter(col("l_quantity") >= 25)
      .select("l_orderkey", "l_quantity")
      .write.format("noop").mode("overwrite").save()
    val m = observation.get
    val session = spark
    import session.implicits._
    Seq((m("rows_in").asInstanceOf[Long],
      m("rows_kept").asInstanceOf[Long],
      m("qty_kept").asInstanceOf[Double]))
      .toDF("rows_in", "rows_kept", "qty_kept")
  }

  val profileObserveOracle: String =
    """SELECT count(*) AS rows_in,
      |  count(CASE WHEN l_quantity >= 25 THEN 1 END) AS rows_kept,
      |  ROUND(sum(CASE WHEN l_quantity >= 25 THEN l_quantity END), 2)
      |    AS qty_kept
      |FROM lineitem""".stripMargin

  /** DIFFERENTIAL-PRIVACY count release — the RELEASE member of the
    * governance suite: k-anonymity/l-diversity/t-closeness DIAGNOSE
    * re-identification risk in a table as stored; the Laplace
    * mechanism is how a published aggregate BOUNDS it. Per-nation
    * customer counts with Laplace(Δf/ε) noise: ε=0.5, sensitivity
    * Δf=1 (a unit counting query — one person changes one count by at
    * most 1), scale b = Δf/ε = 2.0. The draw is the real inverse-CDF
    * Laplace transform `−b·sign(u−½)·ln(1−2|u−½|)`; its uniform is
    * SEEDED from md5(n_name) (the DSIR digest-uniform trick — first 6
    * hex nibbles / 2²⁴, +0.5 in the numerator so u ∈ (0,1) strictly
    * and the log never sees 0) so the release is reproducible and
    * oracle-checkable; a deployment swaps the digest for a CSPRNG
    * draw and nothing else changes. `exact_count` is published beside
    * `dp_count` as the demo's calibration instrument (|noise| has
    * median b·ln2 ≈ 1.39 here) — a real release drops it.
    *
    * Scale: one broadcast dim join + one hash aggregate; the noise is
    * a per-GROUP scalar expression on the aggregated frame — O(groups)
    * extra work however large the fact side, and the whole report is
    * group-cardinality-sized like its three governance siblings.
    */
  def dpCount(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val counts = cust.join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("exact_count"))
    val u = (conv(substring(md5(col("n_name")), 1, 6), 16, 10)
      .cast("double") + lit(0.5)) / lit(16777216.0)
    val centered = u - lit(0.5)
    val sgn = when(centered >= 0, lit(1.0)).otherwise(lit(-1.0))
    val noise = lit(-2.0) * sgn *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts
      .select(col("n_name"), col("exact_count"),
        round(col("exact_count") + noise, 4).as("dp_count"),
        lit(0.5).as("epsilon"))
      .orderBy("n_name")
  }

  val dpCountOracle: String =
    """WITH counts AS (
      |  SELECT n_name, count(*) AS exact_count
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name
      |), seeded AS (
      |  SELECT n_name, exact_count,
      |    (CAST(('0x' || substr(md5(n_name), 1, 6)) AS BIGINT)::DOUBLE
      |      + 0.5) / 16777216.0 AS u
      |  FROM counts
      |)
      |SELECT n_name, exact_count,
      |  ROUND(exact_count + -2.0 *
      |    (CASE WHEN u - 0.5 >= 0 THEN 1.0 ELSE -1.0 END) *
      |    ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS dp_count,
      |  CAST(0.5 AS DOUBLE) AS epsilon
      |FROM seeded ORDER BY n_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "catalog_ddl" -> catalogDdl,
    "profile_observe" -> profileObserve,
    "sink_formats" -> sinkFormats,
    "profile_table" -> profileTable,
    "profile_histogram" -> profileHistogram,
    "profile_drift" -> profileDrift,
    "profile_skew" -> profileSkew,
    "profile_k_anonymity" -> kAnonymity,
    "profile_l_diversity" -> lDiversity,
    "profile_t_closeness" -> tCloseness,
    "profile_dp_count" -> dpCount,
    "profile_expectations" -> profileExpectations)

  def oracles: Map[String, String] = Map(
    "catalog_ddl" -> catalogDdlOracle,
    "profile_observe" -> profileObserveOracle,
    "sink_formats" -> sinkFormatsOracle,
    "profile_table" -> profileTableOracle,
    "profile_histogram" -> profileHistogramOracle,
    "profile_drift" -> profileDriftOracle,
    "profile_skew" -> profileSkewOracle,
    "profile_k_anonymity" -> kAnonymityOracle,
    "profile_l_diversity" -> lDiversityOracle,
    "profile_t_closeness" -> tClosenessOracle,
    "profile_dp_count" -> dpCountOracle,
    "profile_expectations" -> profileExpectationsOracle)
}
