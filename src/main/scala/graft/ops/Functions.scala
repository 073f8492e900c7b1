package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier C scalar-function families (SURVEY.md §2): one demonstrating
  * oracle query per family — string, date/time, math, array, map, json,
  * hash. All built-ins, all codegen'd; no UDFs anywhere (a scalar UDF
  * would break whole-stage codegen and column pruning for zero gain).
  *
  * Cross-engine gotchas encoded here (and mirrored in the oracles):
  * DuckDB `dayofweek` is 0=Sunday vs Spark's 1=Sunday; DuckDB `log` is
  * base-10 (use `ln`); DuckDB `ceil(double)` stays double (cast);
  * DuckDB map subscript returns a single-element list (unwrap with
  * `[1]`); DuckDB `epoch()` returns double (cast).
  */
object Functions {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  private def ts(c: Column): Column = c.cast("timestamp")

  /** String family: case, substring, regex extract, padding, concat,
    * split+element access, length.
    */
  def fnString(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        element_at(split(col("p_type"), " "), 1).as("type_head"))
      .orderBy("p_partkey")

  val fnStringOracle: String =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      |  substr(p_name, 1, 8) AS name_prefix,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  length(p_name) AS name_len,
      |  lpad(p_brand, 12, '*') AS brand_padded,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  string_split(p_type, ' ')[1] AS type_head
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Regular-expression family: extract (first match + all matches),
    * global replace, boolean match — over the free-text corpus where
    * regex work actually happens. Patterns stay in the
    * character-class/anchor-free subset both engines' dialects (Java
    * regex here, RE2 in DuckDB) interpret identically; the oracle pins
    * DuckDB's replace to the 'g' flag because Spark's regexp_replace is
    * global by default and DuckDB's is first-match-only.
    *
    * Scale: all codegen'd scalar work fused into the scan's
    * whole-stage pipeline — regex cost is per-row CPU, never a shuffle.
    */
  def fnRegexp(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        regexp_extract(col("text"), "[a-z]{6,}", 0).as("first_long_word"),
        size(expr("regexp_extract_all(text, '[aeiou]+', 0)"))
          .as("n_vowel_runs"),
        regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "")
          .as("devoweled_head"),
        col("text").rlike("slow .*fast|fast .*slow").as("mixed_speed"))
      .orderBy("doc_id")

  val fnRegexpOracle: String =
    """SELECT doc_id,
      |  regexp_extract(text, '[a-z]{6,}', 0) AS first_long_word,
      |  len(regexp_extract_all(text, '[aeiou]+', 0)) AS n_vowel_runs,
      |  regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g')
      |    AS devoweled_head,
      |  regexp_matches(text, 'slow .*fast|fast .*slow') AS mixed_speed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** URL-parsing family — the web-corpus primitive (domain filters,
    * per-site quality stats and URL-keyed dedup all start here). URLs
    * are synthesized deterministically from the documents fixture (it
    * carries no url column), then decomposed with Spark's codegen'd
    * `parse_url` — HOST, PATH, two QUERY parameters — while the oracle
    * re-derives each part with anchored regexes: the engines must
    * agree on the URL grammar, not merely echo the synthesis.
    * Scale: scalar scan-fused per-row work, no shuffle; the per-host
    * rollup a crawl pipeline runs next is one groupBy over the
    * extracted host (output stays row-level to pin every part).
    */
  def fnUrl(spark: SparkSession, sfDir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/docs/"), col("doc_id"),
      lit("?lang="), col("lang"), lit("&ref=r"), pmod(col("doc_id"), lit(7)))
    t(spark, sfDir, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
      .orderBy("doc_id")
  }

  val fnUrlOracle: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.com/docs/' ||
      |      CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&ref=r' ||
      |      CAST(doc_id % 7 AS VARCHAR) AS url
      |  FROM documents
      |)
      |SELECT doc_id, url,
      |  regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
      |  regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
      |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
      |  regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param
      |FROM u ORDER BY doc_id""".stripMargin

  /** TRY-variant (ANSI-safe) error handling — the functions a pipeline
    * uses at ingest boundaries where bad cells must become NULL, not
    * job failures: try_cast on mixed numeric/garbage strings,
    * try_divide with data-driven zero divisors, try_to_timestamp on
    * partly-invalid date strings, try_element_at with out-of-range
    * indexes, and try_add at the bigint overflow boundary. Inputs are
    * synthesized deterministically so every failure mode actually
    * fires on a known subset of rows. The oracle spells each with
    * DuckDB's equivalents (TRY_CAST, NULLIF-guarded division,
    * TRY_STRPTIME, out-of-bounds list index = NULL) and hand-computes
    * the overflow boundary TRY() semantics. All scan-fused scalar
    * work, no shuffle.
    */
  def fnTry(spark: SparkSession, sfDir: String): DataFrame = {
    val numStr = when(col("doc_id") % 3 === 0,
      col("doc_id").cast("string"))
      .otherwise(concat(lit("x"), col("doc_id")))
    val dateStr = when(col("doc_id") % 4 === 1, lit("not-a-date"))
      .otherwise(concat(lit("2024-01-"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")))
    t(spark, sfDir, "documents")
      .withColumn("num_str", numStr)
      .select(col("doc_id"),
        expr("try_cast(num_str AS BIGINT)").as("parsed_num"),
        round(try_divide(col("doc_id").cast("double"),
          pmod(col("doc_id"), lit(5))), 6).as("ratio"),
        date_format(try_to_timestamp(dateStr, lit("yyyy-MM-dd")),
          "yyyy-MM-dd").as("parsed_date"),
        try_element_at(split(col("text"), " "),
          (pmod(col("doc_id"), lit(200)) + 1).cast("int")).as("nth_word"),
        try_add(lit(9223372036854775800L),
          pmod(col("doc_id"), lit(20))).as("near_overflow"))
      .orderBy("doc_id")
  }

  val fnTryOracle: String =
    """SELECT doc_id,
      |  TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
      |                ELSE 'x' || CAST(doc_id AS VARCHAR) END
      |           AS BIGINT) AS parsed_num,
      |  ROUND(CAST(doc_id AS DOUBLE) / NULLIF(doc_id % 5, 0), 6)
      |    AS ratio,
      |  strftime(TRY_STRPTIME(
      |    CASE WHEN doc_id % 4 = 1 THEN 'not-a-date'
      |         ELSE '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
      |                                 2, '0') END,
      |    '%Y-%m-%d'), '%Y-%m-%d') AS parsed_date,
      |  string_split(text, ' ')[doc_id % 200 + 1] AS nth_word,
      |  CASE WHEN doc_id % 20 <= 7
      |       THEN 9223372036854775800 + doc_id % 20 END
      |    AS near_overflow
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Date/time family: extraction, truncation, day arithmetic, epoch.
    * Timestamps leave as formatted strings so parquet tz metadata never
    * matters.
    */
  def fnDatetime(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_custkey") < 300)
      .select(col("o_orderkey"),
        date_format(ts(col("o_orderdate")), "yyyy-MM-dd").as("order_date"),
        year(ts(col("o_orderdate"))).as("yr"),
        month(ts(col("o_orderdate"))).as("mo"),
        dayofweek(ts(col("o_orderdate"))).as("dow"),
        date_format(date_trunc("month", ts(col("o_orderdate"))), "yyyy-MM-dd")
          .as("month_start"),
        datediff(ts(col("o_orderdate")), lit("1995-01-01").cast("timestamp"))
          .as("days_since"),
        unix_timestamp(ts(col("o_orderdate"))).as("epoch_s"))
      .orderBy("o_orderkey")

  val fnDatetimeOracle: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  dayofweek(o_orderdate) + 1 AS dow,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders WHERE o_custkey < 300 ORDER BY o_orderkey""".stripMargin

  /** Math family: rounding, abs, ceil/floor, sqrt, pow, natural log,
    * modulo — all on decimal-bearing fact columns.
    */
  def fnMath(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price_r2"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        (col("l_linenumber") % 3).as("ln_mod3"))
      .orderBy("l_orderkey", "l_linenumber")

  val fnMathOracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(l_extendedprice, 2) AS price_r2,
      |  ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
      |  ROUND(pow(l_quantity, 2), 2) AS qty_sq,
      |  ROUND(ln(l_extendedprice), 6) AS price_ln,
      |  mod(l_linenumber, 3) AS ln_mod3
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Array family over document word arrays: size, slice, contains,
    * min element, higher-order transform, distinct count. Arrays stay
    * first-class columns through the plan; the result serializes them to
    * canonical '|'-joined strings so every output cell is a hashable
    * scalar for the comparison harness. The minimum uses `array_min`
    * (one O(n) scan) — an earlier draft sorted the whole array to read
    * element 1, an O(n log n) detour no 100 TB row width should pay.
    */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(words).as("n_words"),
        array_join(slice(words, 1, 3), "|").as("first3"),
        array_contains(words, "data").as("has_data"),
        array_min(words).as("first_sorted"),
        array_join(transform(slice(words, 1, 3), w => upper(w)), "|")
          .as("upper3"),
        size(array_distinct(words)).as("n_distinct"))
      .orderBy("doc_id")
  }

  val fnArrayOracle: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  array_to_string((string_split(text, ' '))[1:3], '|') AS first3,
      |  list_contains(string_split(text, ' '), 'data') AS has_data,
      |  list_min(string_split(text, ' ')) AS first_sorted,
      |  array_to_string(list_transform((string_split(text, ' '))[1:3],
      |    w -> upper(w)), '|') AS upper3,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Higher-order-function family — the lambda forms (filter / exists
    * / forall / aggregate / zip_with) that keep per-row collection
    * logic INSIDE the codegen'd scan instead of exploding to rows and
    * re-aggregating: count of long words, membership, a universal
    * property, an in-row fold (total word chars), and a position-
    * tagged zip of the head words. [[fnArray]] covers the shape
    * functions; this is the lambda calculus on top. The oracle spells
    * each with DuckDB list lambdas (or the equivalent list op where
    * the dialect lacks the exact form), so semantics are pinned
    * cross-engine. Every column is scan-fused scalar work — the
    * explode-groupBy spelling of `char_sum` alone would shuffle every
    * word of the corpus.
    */
  def fnHof(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(filter(words, w => length(w) > 5)).as("n_long"),
        exists(words, w => w === "the").as("has_the"),
        forall(words, w => length(w) > 0).as("all_nonempty"),
        aggregate(transform(words, w => length(w).cast("long")),
          lit(0L), (a, b) => a + b).as("char_sum"),
        array_join(
          zip_with(slice(words, 1, 4),
            sequence(lit(1), least(size(words), lit(4))),
            (w, i) => concat(i, lit(":"), w)), "|").as("head_tagged"))
      .orderBy("doc_id")
  }

  val fnHofOracle: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), w -> len(w) > 5))
      |    AS n_long,
      |  list_contains(string_split(text, ' '), 'the') AS has_the,
      |  len(list_filter(string_split(text, ' '), w -> len(w) = 0)) = 0
      |    AS all_nonempty,
      |  CAST(list_sum(list_transform(string_split(text, ' '),
      |    w -> len(w))) AS BIGINT) AS char_sum,
      |  array_to_string(list_transform(
      |    range(1, least(len(string_split(text, ' ')), 4) + 1),
      |    i -> CAST(i AS VARCHAR) || ':' || string_split(text, ' ')[i]),
      |    '|') AS head_tagged
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Map family: construction from columns, key lookup, cardinality,
    * key listing. Values unified to long (Spark maps are monomorphic).
    */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    val m = map(lit("chars"), col("n_chars"),
      lit("words"), size(words).cast("long"))
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        element_at(m, "chars").as("m_chars"),
        element_at(m, "words").as("m_words"),
        size(m).as("n_keys"),
        array_join(sort_array(map_keys(m)), "|").as("keys"))
      .orderBy("doc_id")
  }

  val fnMapOracle: String =
    """SELECT doc_id,
      |  (m['chars'])[1] AS m_chars,
      |  (m['words'])[1] AS m_words,
      |  CAST(cardinality(m) AS INT) AS n_keys,
      |  array_to_string(list_sort(map_keys(m)), '|') AS keys
      |FROM (
      |  SELECT doc_id,
      |    MAP {'chars': n_chars,
      |         'words': CAST(len(string_split(text, ' ')) AS BIGINT)} AS m
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** JSON family over `events.props` (`{"k": <int>}`): path extraction
    * with cast, re-serialization of a struct — the A-wire JsonConverter
    * analog at the scalar level.
    */
  def fnJson(spark: SparkSession, sfDir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    t(spark, sfDir, "events")
      .filter(col("event_id") < 2000)
      .select(col("event_id"), k.as("k"),
        to_json(struct(col("event_id"), k.as("k"))).as("js"))
      .orderBy("event_id")
  }

  val fnJsonOracle: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  to_json(struct_pack(event_id := event_id,
      |    k := CAST(json_extract_string(props, '$.k') AS BIGINT))) AS js
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  /** VARIANT semi-structured navigation (Spark 4's parse-once binary
    * JSON encoding — the engine path for schemaless columns): the
    * props payload and a synthesized NESTED document (object-in-
    * object plus an array) parse to VariantType ONCE, then every
    * typed extraction (`variant_get` with `$.user.id`,
    * `$.user.tags[0]`, …) reads the binary encoding — at 100 TB this
    * replaces N string re-parses per row with one, and the variant
    * column is what shredding/pushdown can later optimize. The oracle
    * navigates the SAME document text with DuckDB's JSON paths, so
    * both engines must agree on path semantics, not echo the
    * synthesis. Complements [[fnJson]] (string-level get_json_object)
    * and [[fnTry]] (error-tolerant parse).
    */
  def fnVariant(spark: SparkSession, sfDir: String): DataFrame = {
    val doc = concat(lit("{\"user\":{\"id\":"), col("user_id"),
      lit(",\"tags\":[\"t"), pmod(col("event_id"), lit(5)),
      lit("\",\"x\"]},\"score\":"), pmod(col("event_id"), lit(100)),
      lit("}"))
    t(spark, sfDir, "events")
      .filter(col("event_id") < 2000)
      .withColumn("v", parse_json(doc))
      .withColumn("pv", parse_json(col("props")))
      .select(col("event_id"),
        variant_get(col("pv"), "$.k", "bigint").as("k"),
        variant_get(col("v"), "$.user.id", "bigint").as("uid"),
        variant_get(col("v"), "$.user.tags[0]", "string").as("tag0"),
        variant_get(col("v"), "$.score", "bigint").as("score"))
      .orderBy("event_id")
  }

  val fnVariantOracle: String =
    """WITH d AS (
      |  SELECT event_id, props,
      |    '{"user":{"id":' || CAST(user_id AS VARCHAR) ||
      |    ',"tags":["t' || CAST(event_id % 5 AS VARCHAR) ||
      |    '","x"]},"score":' || CAST(event_id % 100 AS VARCHAR) || '}'
      |      AS doc
      |  FROM events WHERE event_id < 2000
      |)
      |SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  CAST(json_extract_string(doc, '$.user.id') AS BIGINT) AS uid,
      |  json_extract_string(doc, '$.user.tags[0]') AS tag0,
      |  CAST(json_extract_string(doc, '$.score') AS BIGINT) AS score
      |FROM d ORDER BY event_id""".stripMargin

  /** Hash family: md5 + sha256 content keys (the exact-dedup
    * primitives). xxhash64/crc32 exist Spark-side but have no DuckDB
    * twin, so the oracle-checked pair is md5/sha2 — the LLM dedup ops
    * use these same keys.
    */
  def fnHash(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")

  val fnHashOracle: String =
    """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256,
      |  length(c_name) AS name_len
      |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin

  /** Bitwise family: AND/OR/XOR, shifts, population count, complement —
    * the primitives behind hash bucketing, bloom probes, SimHash
    * Hamming votes and the Z-order interleave
    * (queries/MaintenanceQueries.layoutZorder), demonstrated as
    * first-class scalars. All integer codegen'd expressions; the only
    * cross-engine care is width (DuckDB bit_count returns TINYINT —
    * cast; Spark's returns INT — cast both to BIGINT) and `~` on a
    * BIGINT staying BIGINT on both sides.
    */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(col("p_size")).as("pk_and_size"),
        col("p_partkey").bitwiseOR(col("p_size")).as("pk_or_size"),
        col("p_partkey").bitwiseXOR(col("p_size")).as("pk_xor_size"),
        shiftleft(col("p_size"), 3).as("size_shl3"),
        shiftright(col("p_partkey"), 2).as("pk_shr2"),
        bit_count(col("p_partkey")).cast("long").as("pk_popcount"),
        bitwise_not(col("p_partkey")).as("pk_not"))
      .orderBy("p_partkey")

  val fnBitwiseOracle: String =
    """SELECT p_partkey,
      |  p_partkey & p_size AS pk_and_size,
      |  p_partkey | p_size AS pk_or_size,
      |  xor(p_partkey, CAST(p_size AS BIGINT)) AS pk_xor_size,
      |  p_size << 3 AS size_shl3,
      |  p_partkey >> 2 AS pk_shr2,
      |  CAST(bit_count(p_partkey) AS BIGINT) AS pk_popcount,
      |  ~p_partkey AS pk_not
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Spark 4 STRING COLLATION (`collate(expr, 'UNICODE_CI')`) driving
    * a case-insensitive GROUP BY — the collation-aware comparison
    * semantics SQL engines gate i18n behavior on, exercised end to
    * end through the aggregate path (grouping keys hash/compare under
    * the collation, not binary). Mixed case is synthesized
    * deterministically (even keys initcap'd), so the collated
    * grouping provably collapses what a binary grouping would split;
    * the emitted key is `lower(min(...))` — min is binary UTF8 in
    * both engines and lower() collapses the case split — so the
    * output is representative-choice-independent. DuckDB's oracle
    * spells the same semantics with `GROUP BY ... COLLATE NOCASE`
    * (the fixture is ASCII, where NOCASE and UNICODE_CI agree).
    */
  def fnCollation(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = when(col("c_custkey") % 2 === 0, initcap(col("c_mktsegment")))
      .otherwise(col("c_mktsegment"))
    t(spark, sfDir, "customer")
      .select(seg.as("seg"))
      .groupBy(collate(col("seg"), "UNICODE_CI"))
      .agg(lower(min(col("seg"))).as("seg2"), count(lit(1)).as("n"))
      .select(col("seg2").as("seg"), col("n"))
      .orderBy("seg")
  }

  val fnCollationOracle: String =
    """SELECT lower(min(seg)) AS seg, count(*) AS n FROM (
      |  SELECT CASE WHEN c_custkey % 2 = 0 THEN
      |    upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
      |  ELSE c_mktsegment END AS seg FROM customer)
      |GROUP BY seg COLLATE NOCASE
      |ORDER BY seg""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> fnString,
    "fn_collation" -> fnCollation,
    "fn_datetime" -> fnDatetime,
    "fn_math" -> fnMath,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "fn_hash" -> fnHash,
    "fn_bitwise" -> fnBitwise,
    "fn_regexp" -> fnRegexp,
    "fn_url" -> fnUrl,
    "fn_try" -> fnTry,
    "fn_variant" -> fnVariant,
    "fn_hof" -> fnHof)

  def oracles: Map[String, String] = Map(
    "fn_string" -> fnStringOracle,
    "fn_collation" -> fnCollationOracle,
    "fn_datetime" -> fnDatetimeOracle,
    "fn_math" -> fnMathOracle,
    "fn_array" -> fnArrayOracle,
    "fn_map" -> fnMapOracle,
    "fn_json" -> fnJsonOracle,
    "fn_hash" -> fnHashOracle,
    "fn_bitwise" -> fnBitwiseOracle,
    "fn_regexp" -> fnRegexpOracle,
    "fn_url" -> fnUrlOracle,
    "fn_try" -> fnTryOracle,
    "fn_variant" -> fnVariantOracle,
    "fn_hof" -> fnHofOracle)
}
