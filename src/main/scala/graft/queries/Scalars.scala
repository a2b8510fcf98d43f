package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft

/** Scalar-function library coverage (SURVEY §2.9 — the reference's 460
  * `@ScalarFunction`s in `operator/scalar/`, registered by
  * `metadata/SystemFunctionBundle.java:350`): date/time
  * (`DateTimeFunctions.java`), string (`StringFunctions.java`), regex
  * (`JoniRegexpFunctions.java`/`Re2JRegexpFunctions.java`), math
  * (`MathFunctions.java`), array + higher-order lambdas
  * (`ArrayTransformFunction.java`, `ZipWithFunction.java`,
  * `ArrayReduceFunction.java`), map functions (`MapFromEntries` etc.),
  * binary/crypto (`VarbinaryFunctions.java`), and conditional/try
  * (`TryFunction.java`, `AbstractGreatestLeast.java`).
  *
  * Cross-engine determinism notes: calendar conventions are aligned
  * explicitly (Spark weekday() 0=Monday == oracle isodow-1);
  * transcendentals (exp/ln/trig/cbrt) go through round(·,9) because
  * libm implementations differ in the last ulps; everything integer,
  * string, or algebraic is compared exactly. All functions here are
  * per-row codegen'd builtins — they ride whole-stage codegen and add
  * zero shuffles at any scale.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  // ------------------------------------------------- sc1 date/time
  def sc1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").selectExpr(
      "o_orderkey",
      "CAST(year(o_orderdate) AS BIGINT) AS y",
      "CAST(quarter(o_orderdate) AS BIGINT) AS q",
      "CAST(month(o_orderdate) AS BIGINT) AS m",
      "CAST(day(o_orderdate) AS BIGINT) AS d",
      "CAST(weekday(o_orderdate) AS BIGINT) AS wd", // 0 = Monday
      "CAST(weekofyear(o_orderdate) AS BIGINT) AS woy",
      "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy",
      "CAST(hour(o_orderdate) AS BIGINT) AS h",
      "last_day(CAST(o_orderdate AS DATE)) AS month_end",
      "date_add(CAST(o_orderdate AS DATE), 30) AS plus30",
      "CAST(datediff(DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_to_98",
      "date_trunc('month', o_orderdate) AS mstart",
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm') AS fmt",
      "CAST(unix_timestamp(o_orderdate) AS BIGINT) AS epoch_s")

  val sc1Sql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, quarter(o_orderdate) AS q, month(o_orderdate) AS m,
      |  day(o_orderdate) AS d,
      |  isodow(o_orderdate) - 1 AS wd,
      |  weekofyear(o_orderdate) AS woy,
      |  dayofyear(o_orderdate) AS doy,
      |  hour(o_orderdate) AS h,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(o_orderdate AS DATE) + INTERVAL '30 days' AS plus30,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
      |  date_trunc('month', o_orderdate) AS mstart,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M') AS fmt,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders""".stripMargin

  // --------------------------------------------------- sc2 strings
  def sc2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").selectExpr(
      "c_custkey",
      "upper(c_name) AS up", "lower(c_mktsegment) AS lo",
      "substring(c_name, 1, 8) AS sub",
      "CAST(length(c_name) AS BIGINT) AS len",
      "trim('  pad  ') AS trimmed",
      // reference arg order (string, charset) — CompatAliases registers
      // the two-arg form with that order, shadowing Spark's legacy
      // (trimStr, src) spelling
      "ltrim('xxabc', 'xx') AS ltrimmed",
      "lpad(CAST(c_custkey AS STRING), 8, '0') AS padded",
      "rpad(c_mktsegment, 12, '.') AS rpadded",
      "translate(c_name, 'Cus', 'Kaz') AS transd",
      "repeat('-', 4) AS rep",
      "reverse(c_mktsegment) AS rev",
      "split_part(c_name, '#', 2) AS numpart",
      "CAST(instr(c_name, '#') AS BIGINT) AS hashpos",
      "concat_ws('|', c_mktsegment, c_name) AS joined",
      "left(c_name, 4) AS l4", "right(c_name, 3) AS r3",
      "CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev",
      "c_name LIKE 'Customer%' AS is_cust",
      "startswith(c_name, 'Cust') AS sw", "endswith(c_name, '1') AS ew")

  val sc2Sql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
      |  substring(c_name, 1, 8) AS sub,
      |  length(c_name) AS len,
      |  trim('  pad  ') AS trimmed,
      |  ltrim('xxabc', 'x') AS ltrimmed,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  rpad(c_mktsegment, 12, '.') AS rpadded,
      |  translate(c_name, 'Cus', 'Kaz') AS transd,
      |  repeat('-', 4) AS rep,
      |  reverse(c_mktsegment) AS rev,
      |  split_part(c_name, '#', 2) AS numpart,
      |  strpos(c_name, '#') AS hashpos,
      |  concat_ws('|', c_mktsegment, c_name) AS joined,
      |  left(c_name, 4) AS l4, right(c_name, 3) AS r3,
      |  levenshtein(c_mktsegment, 'BUILDING') AS lev,
      |  c_name LIKE 'Customer%' AS is_cust,
      |  starts_with(c_name, 'Cust') AS sw, ends_with(c_name, '1') AS ew
      |FROM customer""".stripMargin

  // ----------------------------------------------------- sc3 regex
  def sc3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").selectExpr(
      "p_partkey",
      "p_name RLIKE '[aeiou]{2}' AS has_double_vowel",
      "regexp_extract(p_name, '([a-z]+)', 1) AS first_word",
      "regexp_replace(p_name, '[aeiou]', '_') AS devoweled",
      "CAST(size(split(p_name, '[^a-z]+')) AS BIGINT) AS n_chunks",
      "CAST(size(regexp_extract_all(p_name, '[a-z]+', 0)) AS BIGINT) AS n_words")

  val sc3Sql: String =
    """SELECT p_partkey,
      |  regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  len(string_split_regex(p_name, '[^a-z]+')) AS n_chunks,
      |  len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
      |FROM part""".stripMargin

  // ------------------------------------------------------ sc4 math
  def sc4(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .selectExpr(
        "l_orderkey", "l_linenumber",
        "abs(l_quantity - 25) AS dist25",
        "CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil",
        "CAST(floor(l_tax * 100) AS BIGINT) AS tax_floor",
        "round(l_extendedprice / 1000, 2) AS price_k",
        "CAST(sign(l_quantity - 25) AS BIGINT) AS sgn",
        "sqrt(l_quantity) AS rt", // sqrt is IEEE-exact everywhere
        "round(cbrt(l_quantity), 9) AS crt",
        "round(exp(l_discount), 9) AS e_disc",
        "round(ln(l_extendedprice), 9) AS ln_price",
        "round(log2(l_quantity + 1), 9) AS lg2",
        "round(log10(l_extendedprice), 9) AS lg10",
        "round(pow(l_quantity, 1.5), 6) AS qpow",
        "CAST(pmod(CAST(l_orderkey AS INT), 7) AS BIGINT) AS pm7",
        "round(sin(l_discount), 9) AS sn",
        "round(atan2(l_quantity, 10.0), 9) AS at2",
        "round(degrees(l_discount), 9) AS deg",
        "CAST(factorial(l_linenumber) AS BIGINT) AS fact")

  val sc4Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25) AS dist25,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil,
      |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_floor,
      |  round(l_extendedprice / 1000, 2) AS price_k,
      |  CAST(sign(l_quantity - 25) AS BIGINT) AS sgn,
      |  sqrt(l_quantity) AS rt,
      |  round(cbrt(l_quantity), 9) AS crt,
      |  round(exp(l_discount), 9) AS e_disc,
      |  round(ln(l_extendedprice), 9) AS ln_price,
      |  round(log2(l_quantity + 1), 9) AS lg2,
      |  round(log10(l_extendedprice), 9) AS lg10,
      |  round(pow(l_quantity, 1.5), 6) AS qpow,
      |  CAST(CAST(l_orderkey AS INTEGER) % 7 AS BIGINT) AS pm7,
      |  round(sin(l_discount), 9) AS sn,
      |  round(atan2(l_quantity, 10.0), 9) AS at2,
      |  round(degrees(l_discount), 9) AS deg,
      |  CAST(factorial(l_linenumber) AS BIGINT) AS fact
      |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin

  // ------------------------------------- sc5 arrays + higher-order
  /** Higher-order lambdas over computed arrays, one row per distinct
    * array shape (reference ArrayTransformFunction/ZipWithFunction/
    * ArrayReduceFunction → Spark transform/zip_with/aggregate). */
  def sc5(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_linenumber")).distinct()
      .selectExpr(
        "l_linenumber AS n",
        "sequence(1, l_linenumber) AS arr")
      .selectExpr(
        "n",
        "CAST(aggregate(transform(arr, x -> x * x), 0, (a, x) -> a + x) AS BIGINT) AS sumsq",
        "CAST(size(filter(arr, x -> x % 2 = 0)) AS BIGINT) AS evens",
        "exists(arr, x -> x >= 5) AS has_ge5",
        "forall(arr, x -> x > 0) AS all_pos",
        "CAST(aggregate(zip_with(arr, reverse(arr), (a, b) -> a * b), 0, (a, x) -> a + x) AS BIGINT) AS zipsum",
        "CAST(size(flatten(array(arr, arr))) AS BIGINT) AS flat2",
        "concat_ws(',', transform(slice(sort_array(arr, false), 1, 3), x -> CAST(x AS STRING))) AS top3_desc",
        "array_contains(arr, 4) AS has4",
        "CAST(element_at(arr, -1) AS BIGINT) AS last_elem")

  val sc5Sql: String =
    """SELECT n,
      |  CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sumsq,
      |  len(list_filter(arr, x -> x % 2 = 0)) AS evens,
      |  len(list_filter(arr, x -> x >= 5)) > 0 AS has_ge5,
      |  len(list_filter(arr, x -> x > 0)) = len(arr) AS all_pos,
      |  CAST(list_sum(list_transform(list_zip(arr, list_reverse(arr)),
      |    p -> p[1] * p[2])) AS BIGINT) AS zipsum,
      |  len(flatten([arr, arr])) AS flat2,
      |  array_to_string(list_transform(list_reverse_sort(arr)[1:3],
      |    x -> CAST(x AS VARCHAR)), ',') AS top3_desc,
      |  list_contains(arr, 4) AS has4,
      |  arr[-1] AS last_elem
      |FROM (SELECT DISTINCT l_linenumber AS n, generate_series(1, l_linenumber) AS arr
      |      FROM lineitem) t""".stripMargin

  // ------------------------------------------------------ sc6 maps
  /** Map construction/access round-trip rendered canonically (maps
    * have no stable cross-engine literal form, so the comparison is on
    * extracted keys/values/cardinality). */
  def sc6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
      .selectExpr("map_from_entries(array(struct(o_orderpriority AS k, c AS v))) AS m")
      .selectExpr(
        "element_at(map_keys(m), 1) AS k1",
        "CAST(element_at(map_values(m), 1) AS BIGINT) AS v1",
        "CAST(cardinality(m) AS BIGINT) AS card",
        "CAST(element_at(m, element_at(map_keys(m), 1)) AS BIGINT) AS lookup")

  val sc6Sql: String =
    """SELECT map_keys(m)[1] AS k1,
      |  CAST(map_values(m)[1] AS BIGINT) AS v1,
      |  CAST(cardinality(m) AS BIGINT) AS card,
      |  CAST(m[map_keys(m)[1]][1] AS BIGINT) AS lookup
      |FROM (
      |  SELECT map_from_entries([(o_orderpriority, c)]) AS m FROM (
      |    SELECT o_orderpriority, count(*) AS c FROM orders
      |    GROUP BY o_orderpriority) g) t""".stripMargin

  // --------------------------------------------- sc7 binary/crypto
  def sc7(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .selectExpr(
        "doc_id",
        "md5(text) AS h_md5",
        "sha2(text, 256) AS h_sha256",
        "hex(n_chars) AS len_hex",
        "base64(encode(substring(text, 1, 9), 'UTF-8')) AS head_b64",
        "decode(unbase64(base64(encode(substring(text, 1, 9), 'UTF-8'))), 'UTF-8') AS roundtrip",
        "bit_count(CAST(n_chars AS BIGINT), 64) AS popcnt")

  val sc7Sql: String =
    """SELECT doc_id,
      |  md5(text) AS h_md5,
      |  sha256(text) AS h_sha256,
      |  to_hex(n_chars) AS len_hex,
      |  to_base64(CAST(substring(text, 1, 9) AS BLOB)) AS head_b64,
      |  CAST(from_base64(to_base64(CAST(substring(text, 1, 9) AS BLOB))) AS VARCHAR) AS roundtrip,
      |  CAST(bit_count(n_chars) AS BIGINT) AS popcnt
      |FROM documents WHERE doc_id < 100""".stripMargin

  // ------------------------------------------- sc8 conditional/try
  /** try_-family error suppression, greatest/least, nullif/coalesce —
    * reference TryFunction.java / AbstractGreatestLeast.java.
    * Scope note: try_* evaluates by catching the underlying per-row
    * exception, so a predicate that fails on EVERY row costs a thrown
    * JVM exception per row — fine as a semantics fixture on a bounded
    * slice, but at 100 TB try_ belongs on rarely-failing paths (or
    * pre-guarded with a cheap filter), never on an always-failing hot
    * loop. */
  def sc8(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 2000)
      .selectExpr(
        "l_returnflag",
        "try_divide(l_extendedprice, l_quantity - l_quantity) AS div0",
        "try_cast(l_returnflag AS INT) AS badcast",
        "greatest(l_quantity, l_discount * 100, 10.0) AS g",
        "least(l_quantity, l_tax * 100) AS l",
        "nullif(l_linenumber, 1) AS nn",
        "coalesce(nullif(l_linenumber, 1), -1) AS co")
      .groupBy(col("l_returnflag"))
      .agg(
        count(col("div0")).as("div0_nonnull"),
        count(col("badcast")).as("badcast_nonnull"),
        sum(col("g").cast("decimal(12,2)")).cast("double").as("g_sum"),
        sum(col("l").cast("decimal(12,2)")).cast("double").as("l_sum"),
        count(col("nn")).as("nn_cnt"),
        sum(col("co")).cast("long").as("co_sum"))

  val sc8Sql: String =
    """SELECT l_returnflag,
      |  count(CASE WHEN l_quantity - l_quantity <> 0
      |        THEN l_extendedprice / (l_quantity - l_quantity) END) AS div0_nonnull,
      |  count(try_cast(l_returnflag AS INTEGER)) AS badcast_nonnull,
      |  CAST(sum(CAST(greatest(l_quantity, l_discount * 100, 10.0) AS DECIMAL(12,2))) AS DOUBLE) AS g_sum,
      |  CAST(sum(CAST(least(l_quantity, l_tax * 100) AS DECIMAL(12,2))) AS DOUBLE) AS l_sum,
      |  count(nullif(l_linenumber, 1)) AS nn_cnt,
      |  CAST(sum(coalesce(nullif(l_linenumber, 1), -1)) AS BIGINT) AS co_sum
      |FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_returnflag""".stripMargin

  // ----------------------------------- sc9 registry UDF gap-fill
  /** The deterministic half of the UDF registry, under the full hash
    * gate: ngrams counting, the Wilson interval (the oracle spells the
    * IDENTICAL arithmetic — same operation order, literal z² product —
    * so the IEEE doubles match bit-for-bit; sqrt is exact), the
    * url_encode/url_decode round-trip, and ip_prefix_contains with a
    * provably-contained address. */
  def sc9a(s: SparkSession, dir: String): DataFrame = {
    graft.engine.Graft.registerAll(s, dir)
    s.sql(
      """WITH m AS (
        |  SELECT doc_id, text, n_chars, split(text, ' ') AS w,
        |    split_to_multimap(concat('a=', CAST(doc_id % 3 AS STRING), ';b=',
        |      CAST(doc_id % 5 AS STRING), ';a=', CAST(doc_id % 7 AS STRING)),
        |      ';', '=') AS mm
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(size(ngrams(w, 3)) AS BIGINT) AS n_3grams,
        |  wilson_interval_lower(CAST(n_chars % 20 AS BIGINT), 20, 1.96) AS wl,
        |  url_decode(url_encode(substring(text, 1, 24))) = substring(text, 1, 24) AS url_rt,
        |  ip_prefix_contains('10.0.0.0/8', concat('10.0.0.', CAST(doc_id % 256 AS STRING))) AS in_net,
        |  contains_sequence(w, slice(w, 3, 2)) AS has_run,
        |  contains_sequence(w, reverse(slice(w, 3, 2))) AS has_rev,
        |  format_number(CAST(doc_id AS BIGINT) * 1236) AS fmt,
        |  array_join(transform(array_sort(map_keys(mm)),
        |    k -> concat(k, ':', array_join(mm[k], ','))), '|') AS mmap
        |FROM m""".stripMargin)
  }

  val sc9aSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w,
      |    CAST(n_chars % 20 AS DOUBLE) / 20 AS p,
      |    CAST(1.96 AS DOUBLE) AS z,
      |    CAST(doc_id AS BIGINT) * 1236 AS v
      |  FROM documents WHERE doc_id < 200),
      |d2 AS (
      |  SELECT *, w[3:4] AS q, list_reverse(w[3:4]) AS q2, v / 1000.0 AS f
      |  FROM d)
      |SELECT doc_id,
      |  CASE WHEN len(w) >= 3 THEN CAST(len(w) AS BIGINT) - 2
      |       ELSE CAST(1 AS BIGINT) END AS n_3grams,
      |  LEAST(1.0, GREATEST(0.0,
      |    (p + (z*z) / 40 - z * sqrt(p * (1 - p) / 20
      |       + (z*z) / (4.0 * 20 * 20))) / (1 + (z*z) / 20))) AS wl,
      |  TRUE AS url_rt,
      |  TRUE AS in_net,
      |  len(list_filter(generate_series(1, len(w) - len(q) + 1),
      |    i -> w[i:i+len(q)-1] = q)) > 0 AS has_run,
      |  len(list_filter(generate_series(1, len(w) - len(q2) + 1),
      |    i -> w[i:i+len(q2)-1] = q2)) > 0 AS has_rev,
      |  CASE WHEN v < 1000 THEN CAST(v AS VARCHAR)
      |       WHEN f < 10 THEN rtrim(rtrim(CAST(round(f, 2) AS VARCHAR), '0'), '.') || 'K'
      |       WHEN f < 100 THEN rtrim(rtrim(CAST(round(f, 1) AS VARCHAR), '0'), '.') || 'K'
      |       ELSE CAST(CAST(round(f, 0) AS BIGINT) AS VARCHAR) || 'K' END AS fmt,
      |  'a:' || CAST(doc_id % 3 AS VARCHAR) || ',' || CAST(doc_id % 7 AS VARCHAR)
      |    || '|b:' || CAST(doc_id % 5 AS VARCHAR) AS mmap
      |FROM d2""".stripMargin

  /** The engine-specific remainder (Porter1 stems, heuristic lang-id):
    * rows-only by design; exact kernel semantics are pinned by
    * FunctionsSpec. */
  def sc9b(s: SparkSession, dir: String): DataFrame = {
    graft.engine.Graft.registerAll(s, dir)
    s.sql(
      """SELECT doc_id,
        |  word_stem(split_part(text, ' ', 1)) AS first_stem,
        |  lang_id(text) AS lang_guess
        |FROM documents WHERE doc_id < 200""".stripMargin)
  }

  // --------------------------------- sc10 epoch/constructor datetime
  /** Epoch conversions and date/timestamp constructors (reference
    * DateTimeFunctions from_unixtime/to_unixtime family). */
  def sc10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .selectExpr("o_orderkey", "CAST(unix_timestamp(o_orderdate) AS BIGINT) AS es")
      .selectExpr(
        "o_orderkey",
        "es",
        "from_unixtime(es, 'yyyy-MM-dd HH:mm:ss') AS human",
        "timestamp_seconds(es) AS ts_back",
        "timestamp_millis(es * 1000) AS ts_ms",
        "date_from_unix_date(CAST(es DIV 86400 AS INT)) AS d_back",
        "make_date(2024, CAST(es % 12 AS INT) + 1, 15) AS mk_d",
        "make_timestamp(2024, 1, 2, 3, 4, CAST(es % 60 AS INT)) AS mk_ts")

  val sc10Sql: String =
    """SELECT o_orderkey, es,
      |  strftime(to_timestamp(es), '%Y-%m-%d %H:%M:%S') AS human,
      |  CAST(to_timestamp(es) AS TIMESTAMP) AS ts_back,
      |  epoch_ms(es * 1000) AS ts_ms,
      |  DATE '1970-01-01' + INTERVAL (es // 86400) DAYS AS d_back,
      |  make_date(2024, CAST(es % 12 AS INT) + 1, 15) AS mk_d,
      |  make_timestamp(2024, 1, 2, 3, 4, CAST(es % 60 AS INT)) AS mk_ts
      |FROM (SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS es
      |      FROM orders WHERE o_orderkey <= 2000) t""".stripMargin

  // ----------------------------- sc11 string distance / normalization
  /** String-distance and Unicode-normalization gap-fill (reference
    * StringFunctions levenshtein_distance / hamming_distance /
    * normalize; SplitToMapFunction via the split_to_map → str_to_map
    * dialect mapping). The NFC column appends a decomposed accent
    * ('e' + combining acute) that normalization composes into one
    * codepoint — both engines' length() counts codepoints, so the
    * composed length pins real normalization, not a no-op. The
    * split_to_map round-trip parses a string built from source
    * columns, so the oracle reads the expected value directly. */
  def sc11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .select(
        col("c_custkey"),
        levenshtein(col("c_name"), reverse(col("c_name"))).cast("long").as("lev"),
        call_udf("hamming_distance", col("c_name"), reverse(col("c_name"))).as("ham"),
        length(call_udf("normalize",
          concat(col("c_name"), lit("e\u0301")), lit("NFC"))).cast("long").as("nfc_len"),
        element_at(
          expr("str_to_map(concat('a:', c_custkey % 5, ';b:', c_mktsegment), ';', ':')"),
          lit("b")).as("seg"))

  val sc11Sql: String =
    """SELECT c_custkey,
      |  CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev,
      |  CAST(hamming(c_name, reverse(c_name)) AS BIGINT) AS ham,
      |  CAST(length(nfc_normalize(c_name || 'e' || chr(769))) AS BIGINT) AS nfc_len,
      |  c_mktsegment AS seg
      |FROM customer WHERE c_custkey <= 500""".stripMargin

  // ------------------------- sc12 data sizes, durations, distributions
  /** Data-size parsing (DataSizeFunctions), human-readable durations
    * (DateTimeFunctions human_readable_seconds), base32 codecs
    * (VarbinaryFunctions), and the distribution functions
    * (MathFunctions normal_cdf / inverse_normal_cdf / beta_cdf). The
    * oracle recomputes sizes arithmetically, rebuilds the duration
    * string relationally, and pins beta_cdf against the closed form
    * for integer parameters under round(·,9); the normal roundtrip is
    * a 1e-8 bound — the unit suite pins exact known values. */
  def sc12(s: SparkSession, dir: String): DataFrame = {
    val x = (col("c_custkey") % 10) / lit(10.0)
    val z = (col("c_acctbal").cast("double") % 1000) / lit(500.0)
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .select(
        col("c_custkey"),
        call_udf("parse_data_size",
          concat((col("c_custkey") % 100).cast("string"), lit("kB"))).as("kb_bytes"),
        call_udf("parse_data_size",
          concat((col("c_custkey") % 9).cast("string"), lit(".5GB"))).as("gb_bytes"),
        call_udf("human_readable_seconds",
          (col("c_custkey") % 700000).cast("double")).as("dur"),
        (call_udf("from_base32", call_udf("to_base32", encode(col("c_name"), "UTF-8")))
          === encode(col("c_name"), "UTF-8")).as("b32_rt"),
        (abs(call_udf("inverse_normal_cdf", lit(0.0), lit(1.0),
          call_udf("normal_cdf", lit(0.0), lit(1.0), z)) - z) < 1e-8).as("ncdf_rt"),
        round(call_udf("beta_cdf", lit(2.0), lit(5.0), x), 9).as("beta9"),
        // printf-style format (reference FormatFunction): %.2f is
        // rounding-free here because acctbal carries exactly 2 dp
        format_string("%.2f|%05d", col("c_acctbal"), col("c_custkey")).as("fmt"))
  }

  val sc12Sql: String =
    """WITH u AS (
      |  SELECT c_custkey,
      |    (c_custkey % 700000) // 604800 AS w,
      |    ((c_custkey % 700000) % 604800) // 86400 AS d,
      |    ((c_custkey % 700000) % 86400) // 3600 AS h,
      |    ((c_custkey % 700000) % 3600) // 60 AS m,
      |    (c_custkey % 700000) % 60 AS sec,
      |    (c_custkey % 10) / 10.0 AS x,
      |    c_acctbal
      |  FROM customer WHERE c_custkey <= 500)
      |SELECT c_custkey,
      |  CAST((c_custkey % 100) * 1024 AS BIGINT) AS kb_bytes,
      |  CAST((c_custkey % 9 + 0.5) * 1073741824 AS BIGINT) AS gb_bytes,
      |  COALESCE(NULLIF(concat_ws(', ',
      |    CASE WHEN w > 0 THEN w || ' week' || (CASE WHEN w > 1 THEN 's' ELSE '' END) END,
      |    CASE WHEN d > 0 THEN d || ' day' || (CASE WHEN d > 1 THEN 's' ELSE '' END) END,
      |    CASE WHEN h > 0 THEN h || ' hour' || (CASE WHEN h > 1 THEN 's' ELSE '' END) END,
      |    CASE WHEN m > 0 THEN m || ' minute' || (CASE WHEN m > 1 THEN 's' ELSE '' END) END,
      |    CASE WHEN sec > 0 THEN sec || ' second' || (CASE WHEN sec > 1 THEN 's' ELSE '' END) END
      |  ), ''), '0 seconds') AS dur,
      |  TRUE AS b32_rt,
      |  TRUE AS ncdf_rt,
      |  round(1 - power(1 - x, 6) - 6 * x * power(1 - x, 5), 9) AS beta9,
      |  printf('%.2f|%05d', c_acctbal, c_custkey) AS fmt
      |FROM u""".stripMargin

  // ------------------------------------------- sc13 full JSON family
  /** The JSON function family beyond p7's get_json_object (reference
    * `JsonFunctions.java` 461 LoC + JSON casts): construction
    * (to_json ≡ json_format), path extraction with array subscripts,
    * json_array_length, full typed parse-back (from_json ≡ CAST(json
    * AS row)), missing-path null semantics, and schema inference
    * (schema_of_json). The documents are BUILT from source columns so
    * both engines serialize the identical compact JSON and the oracle
    * can also read expected values straight from the source. */
  def sc13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 500)
      .withColumn("doc", to_json(struct(
        col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
        array(col("c_custkey") % 10, col("c_custkey") % 7).as("vals"))))
      .selectExpr(
        "c_custkey",
        "doc",
        "CAST(get_json_object(doc, '$.vals[1]') AS BIGINT) AS v1",
        "CAST(json_array_length(get_json_object(doc, '$.vals')) AS BIGINT) AS alen",
        "from_json(doc, 'id BIGINT, seg STRING, vals ARRAY<BIGINT>').seg AS rt_seg",
        "CAST(from_json(doc, 'id BIGINT, seg STRING, vals ARRAY<BIGINT>').vals[0] AS BIGINT) AS rt_v0",
        "get_json_object(doc, '$.missing') IS NULL AS no_missing",
        "json_size(doc, '$') AS obj_size",
        "json_size(doc, '$.vals') AS arr_size")

  val sc13Sql: String =
    """WITH d AS (
      |  SELECT c_custkey,
      |    to_json(struct_pack(id := c_custkey, seg := c_mktsegment,
      |      vals := [c_custkey % 10, c_custkey % 7])) AS doc
      |  FROM customer WHERE c_custkey <= 500)
      |SELECT c_custkey, CAST(doc AS VARCHAR) AS doc,
      |  CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS v1,
      |  CAST(json_array_length(doc, '$.vals') AS BIGINT) AS alen,
      |  json_extract_string(doc, '$.seg') AS rt_seg,
      |  CAST(json_extract(doc, '$.vals[0]') AS BIGINT) AS rt_v0,
      |  json_extract(doc, '$.missing') IS NULL AS no_missing,
      |  CAST(len(json_keys(doc)) AS BIGINT) AS obj_size,
      |  CAST(json_array_length(doc, '$.vals') AS BIGINT) AS arr_size
      |FROM d""".stripMargin

  // ------------------------------------------- sc14 SQL/JSON 2016
  /** The standard-SQL JSON accessors a migrating reference user writes
    * (reference `operator/scalar/json/JsonExistsFunction.java` /
    * JsonValueFunction.java / JsonQueryFunction.java, grammar
    * `SqlBase.g4:540-563`): json_exists incl. the JSON-null-present
    * case, json_value's scalar-only contract (containers → NULL),
    * json_query's JSON-text rendering, and `lax` path-mode prefixes.
    * Docs are BUILT from source columns (ignoreNullFields=false so a
    * NULL source field serializes as a JSON null on both engines, like
    * DuckDB's struct_pack). The RETURNING-clause dialect rewrite is
    * unit-tested in DialectSpec. */
  def sc14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 500)
      .withColumn("doc", to_json(struct(
        col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
        array(col("c_custkey") % 10, col("c_custkey") % 7).as("vals"),
        when(col("c_acctbal") < 0, lit("neg")).as("nn")),
        Map("ignoreNullFields" -> "false")))
      .selectExpr(
        "c_custkey",
        "json_exists(doc, 'lax $.seg') AS je_seg",
        "json_exists(doc, '$.nn') AS je_nn",
        "json_exists(doc, '$.missing') AS je_missing",
        "json_value(doc, 'lax $.seg') AS jv_seg",
        "json_value(doc, '$.nn') AS jv_nn",
        "json_value(doc, '$.vals') AS jv_vals",
        "CAST(json_value(doc, '$.vals[0]') AS BIGINT) AS jv_v0",
        "json_query(doc, 'lax $.vals') AS jq_vals",
        "json_query(doc, '$.seg') AS jq_seg",
        "json_query(doc, '$.missing') AS jq_missing")

  val sc14Sql: String =
    """WITH d AS (
      |  SELECT c_custkey,
      |    to_json(struct_pack(id := c_custkey, seg := c_mktsegment,
      |      vals := [c_custkey % 10, c_custkey % 7],
      |      nn := CASE WHEN c_acctbal < 0 THEN 'neg' END)) AS doc
      |  FROM customer WHERE c_custkey <= 500)
      |SELECT c_custkey,
      |  json_type(doc, '$.seg') IS NOT NULL AS je_seg,
      |  json_type(doc, '$.nn') IS NOT NULL AS je_nn,
      |  json_type(doc, '$.missing') IS NOT NULL AS je_missing,
      |  json_extract_string(doc, '$.seg') AS jv_seg,
      |  json_extract_string(doc, '$.nn') AS jv_nn,
      |  CASE WHEN json_type(doc, '$.vals') IN ('OBJECT', 'ARRAY') THEN NULL
      |       ELSE json_extract_string(doc, '$.vals') END AS jv_vals,
      |  CAST(json_extract(doc, '$.vals[0]') AS BIGINT) AS jv_v0,
      |  CAST(json_extract(doc, '$.vals') AS VARCHAR) AS jq_vals,
      |  CAST(json_extract(doc, '$.seg') AS VARCHAR) AS jq_seg,
      |  CAST(json_extract(doc, '$.missing') AS VARCHAR) AS jq_missing
      |FROM d""".stripMargin

  // ------------------------------------------- sc15 url_extract family
  /** url_extract_protocol/host/port/path/query/fragment/parameter
    * (reference `operator/scalar/UrlFunctions.java`) — java.net.URI
    * UDFs with the reference's contract: invalid URL → NULL, absent
    * component → '' (absent port → NULL). URLs are BUILT from source
    * columns, so the oracle pins ground truth recomputed from the
    * same columns rather than a second URL parser. */
  def sc15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 1000)
      .withColumn("u", concat(
        lit("https://api.example.com"),
        when(col("c_custkey") % 3 === 0, lit(":8443")).otherwise(lit("")),
        lit("/cust/"), col("c_custkey"),
        lit("?seg="), col("c_mktsegment"), lit("&n="), col("c_nationkey"),
        when(col("c_custkey") % 2 === 0, lit("#top")).otherwise(lit(""))))
      .selectExpr(
        "c_custkey",
        "url_extract_protocol(u) AS proto",
        "url_extract_host(u) AS host",
        "url_extract_port(u) AS port",
        "url_extract_path(u) AS path",
        "url_extract_query(u) AS qry",
        "url_extract_fragment(u) AS frag",
        "url_extract_parameter(u, 'seg') AS seg",
        "CAST(url_extract_parameter(u, 'n') AS BIGINT) AS nkey")

  val sc15Sql: String =
    """SELECT c_custkey,
      |  'https' AS proto,
      |  'api.example.com' AS host,
      |  CASE WHEN c_custkey % 3 = 0 THEN CAST(8443 AS BIGINT) END AS port,
      |  '/cust/' || c_custkey AS path,
      |  'seg=' || c_mktsegment || '&n=' || c_nationkey AS qry,
      |  CASE WHEN c_custkey % 2 = 0 THEN 'top' ELSE '' END AS frag,
      |  c_mktsegment AS seg,
      |  CAST(c_nationkey AS BIGINT) AS nkey
      |FROM customer WHERE c_custkey <= 1000""".stripMargin

  // --------------------------- sc16 timezone / ISO-8601 / Joda parse
  /** Timezone scalar family (reference `scalar/timestamptz/
    * AtTimeZone.java:30`, `WithTimeZone.java`, grammar `SqlBase.g4:482`
    * AT TIME ZONE; `DateTimeFunctions.java:199` to_iso8601 /
    * from_iso8601_* / parse_datetime). The query text is written in
    * the REFERENCE dialect — `AT TIME ZONE` goes through the
    * sqlcompat translator — and exercises both conversion directions
    * (instant → zone wall clock, zone wall clock → instant), the
    * ISO-8601 format/parse pair, and the Joda-pattern parse that
    * inverts format_datetime. Zone choice: Asia/Tokyo has had a fixed
    * +09:00 offset with no DST for the fixture's whole date range, so
    * the oracle pins ground truth with plain interval arithmetic —
    * independent of the oracle engine's tzdb (DuckDB needs ICU for
    * named zones), while the engine side still resolves the zone name
    * through the real tz machinery. */
  val sc16Reference: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS TIMESTAMP) AT TIME ZONE 'Asia/Tokyo' AS tokyo_local,
      |  at_timezone(CAST(o_orderdate AS TIMESTAMP), 'Asia/Tokyo') AS tokyo_fn,
      |  with_timezone(CAST(o_orderdate AS TIMESTAMP), 'Asia/Tokyo') AS tokyo_instant,
      |  to_iso8601(CAST(o_orderdate AS TIMESTAMP)) AS iso,
      |  from_iso8601_timestamp(to_iso8601(CAST(o_orderdate AS TIMESTAMP))) AS iso_rt,
      |  from_iso8601_date(substr(to_iso8601(CAST(o_orderdate AS TIMESTAMP)), 1, 10)) AS iso_d,
      |  parse_datetime(format_datetime(CAST(o_orderdate AS TIMESTAMP), 'YYYY/MM/dd HH:mm:ss'),
      |                 'YYYY/MM/dd HH:mm:ss') AS joda_rt
      |FROM orders WHERE o_orderkey <= 2000""".stripMargin

  def sc16(s: SparkSession, dir: String): DataFrame = {
    Graft.registerAll(s, dir)
    s.sql(graft.sqlcompat.Dialect.translate(sc16Reference))
  }

  val sc16Sql: String =
    """SELECT o_orderkey,
      |  ts + INTERVAL 9 HOUR AS tokyo_local,
      |  ts + INTERVAL 9 HOUR AS tokyo_fn,
      |  ts - INTERVAL 9 HOUR AS tokyo_instant,
      |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso,
      |  ts AS iso_rt,
      |  CAST(ts AS DATE) AS iso_d,
      |  ts AS joda_rt
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts
      |      FROM orders WHERE o_orderkey <= 2000) t""".stripMargin

  // ------------------------------------------------- sc17 soundex
  /** soundex (reference `StringFunctions.java:962`) — Spark ships the
    * same US-census algorithm as a codegen built-in, so the engine
    * side is one function call; the oracle engine has no soundex, so
    * the oracle REIMPLEMENTS the census algorithm in pure SQL (a
    * list_reduce fold carrying `result|lastCode` state) — verified
    * char-for-char against the engine on the edge cases: h/w
    * transparency (Ashcraft→A261), vowel reset (Honeyman→H555),
    * non-letter reset (`b1b`→B100), first-char-code suppression
    * (Pfister→P236), non-letter first char returns the input
    * unchanged. Nation names give 25 distinct inputs including an
    * embedded space (SAUDI ARABIA). */
  def sc17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"),
        expr("soundex(n_name)").as("sx"),
        expr("soundex(lower(n_name))").as("sx_lower"))

  val sc17Sql: String = {
    // census soundex as a DuckDB fold; `s` is spliced per input column
    def sx(col: String): String =
      s"""CASE WHEN NOT substr(upper($col),1,1) BETWEEN 'A' AND 'Z' THEN $col
         |ELSE rpad(split_part(list_reduce(
         |  list_prepend(
         |    substr(upper($col),1,1) || '|' ||
         |      translate(substr(upper($col),1,1),
         |        'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230127022455012623017202'),
         |    list_transform(range(2, length($col) + 1), i ->
         |      translate(substr(regexp_replace(upper($col), '[^A-Z]', '~', 'g'),
         |          CAST(i AS INT), 1),
         |        'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230127022455012623017202'))),
         |  (acc, c) -> CASE
         |    WHEN length(split_part(acc,'|',1)) >= 4 THEN acc
         |    WHEN c = '~' OR c = '0' THEN split_part(acc,'|',1) || '|0'
         |    WHEN c = '7' THEN acc
         |    WHEN c <> split_part(acc,'|',2)
         |      THEN (split_part(acc,'|',1) || c) || '|' || c
         |    ELSE split_part(acc,'|',1) || '|' || c
         |  END), '|', 1), 4, '0')
         |END""".stripMargin
    s"""SELECT n_nationkey, n_name,
       |  ${sx("n_name")} AS sx,
       |  ${sx("lower(n_name)")} AS sx_lower
       |FROM nation""".stripMargin
  }

  // -------------------------- sc18 durations / last_day / crc32
  /** Duration + calendar + checksum stragglers (reference
    * `scalar/DateTimeFunctions.java` to_milliseconds and
    * last_day_of_month, `ParseDurationFunction.java`,
    * `VarbinaryFunctions.java` crc32): `parse_duration` handles every
    * airlift unit (ms/s/m/h + a fractional case) on ms-exact inputs,
    * `to_milliseconds` projects an interval born from timestamp
    * subtraction, `last_day_of_month` is the name-alias of the codegen
    * LastDay, and crc32 is Spark's builtin over ASCII priorities. The
    * oracle rebuilds durations with plain ms arithmetic, last_day with
    * DuckDB's own last_day, and CRC-32 as a pure-SQL reflected
    * 0xEDB88320 bit fold (validated against zlib).
    */
  def sc18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .selectExpr(
        "o_orderkey",
        "last_day_of_month(o_orderdate) AS eom",
        "to_milliseconds(CAST(o_orderdate AS TIMESTAMP) - TIMESTAMP '1992-01-01 00:00:00') AS age_ms",
        "to_milliseconds(parse_duration((o_orderkey % 900) || 'ms')) AS d_ms",
        "to_milliseconds(parse_duration((o_orderkey % 48) || 'h')) AS d_h",
        "to_milliseconds(parse_duration((o_orderkey % 90) || 'm')) AS d_m",
        "to_milliseconds(parse_duration((o_orderkey % 10) || '.5s')) AS d_frac",
        "crc32(CAST(o_orderpriority AS BINARY)) AS prio_crc")

  val sc18Sql: String = {
    // reflected CRC-32 (poly 0xEDB88320) as a DuckDB fold: byte loop
    // via list_reduce, 8 shift steps per byte via an inner fold
    def crc(c: String): String =
      s"""xor(4294967295, list_reduce(
         |  list_prepend(CAST(4294967295 AS BIGINT),
         |    list_transform(range(1, length($c) + 1),
         |      i -> CAST(ord(substr($c, CAST(i AS INT), 1)) AS BIGINT))),
         |  (crc, b) -> list_reduce(
         |     list_prepend(xor(crc, b), [1,2,3,4,5,6,7,8]),
         |     (c2, s) -> xor(c2 >> 1,
         |        CASE WHEN c2 & 1 = 1 THEN 3988292384 ELSE 0 END))))""".stripMargin
    s"""SELECT o_orderkey,
       |  last_day(o_orderdate) AS eom,
       |  epoch_ms(CAST(o_orderdate AS TIMESTAMP) - TIMESTAMP '1992-01-01 00:00:00') AS age_ms,
       |  CAST(o_orderkey % 900 AS BIGINT) AS d_ms,
       |  CAST(o_orderkey % 48 AS BIGINT) * 3600000 AS d_h,
       |  CAST(o_orderkey % 90 AS BIGINT) * 60000 AS d_m,
       |  CAST(o_orderkey % 10 AS BIGINT) * 1000 + 500 AS d_frac,
       |  ${crc("o_orderpriority")} AS prio_crc
       |FROM orders WHERE o_orderkey <= 2000""".stripMargin
  }

  // ----------------------- sc19 zone-preserving timestamptz emulation
  /** Zone-preserving TIMESTAMP WITH TIME ZONE (reference
    * `spi/type/TimestampWithTimeZoneType.java`,
    * `DateTimeEncoding.java`: the VALUE carries its zone; equality is
    * on the instant but rendering/extract honor the zone) via
    * [[graft.functions.TimestampTz]] — the struct<instant, zone>
    * emulation closing the last type-system row. Exercises: per-zone
    * ISO-8601 rendering of the SAME instants (offset suffix differs by
    * zone, `Z` at zero offset — java.time ISO_OFFSET_DATE_TIME
    * behavior, reference to_iso8601), zone-local hour extraction,
    * at_timezone instant preservation, and the with_timezone/wall
    * round trip. Zones are fixed-offset for the fixture's date range
    * (UTC, Asia/Tokyo +09:00, Asia/Kolkata +05:30 — no DST), so the
    * oracle pins ground truth with interval arithmetic, tzdb-free,
    * while the engine resolves real zone ids (sc16 discipline). The
    * instant-preservation and round-trip booleans are engine-computed
    * invariants (oracle pins TRUE — the hll1 protocol). */
  def sc19(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TimestampTz => TZ}
    val zone = element_at(
      array(lit("UTC"), lit("Asia/Tokyo"), lit("Asia/Kolkata")),
      (col("user_id") % 3 + 1).cast("int"))
    Graft.events(s, dir)
      .select(date_trunc("second", col("ts")).as("ts"),
        TZ.ofInstant(date_trunc("second", col("ts")), zone).as("tstz"))
      .withColumn("tokyo", TZ.atTimezone(col("tstz"), lit("Asia/Tokyo")))
      .select(
        col("tstz")("zone").as("zone"),
        hour(TZ.wall(col("tstz"))).cast("long").as("hr"),
        TZ.iso8601(col("tstz")).as("iso"),
        TZ.iso8601(col("tokyo")).as("iso_tokyo"),
        (col("tokyo")("instant") === col("tstz")("instant"))
          .as("instant_preserved"),
        (TZ.make(TZ.wall(col("tstz")), col("tstz")("zone"))("instant")
          === col("tstz")("instant")).as("wall_roundtrip"))
      .groupBy(col("zone"), col("hr"))
      .agg(count(lit(1)).as("cnt"),
        min(col("iso")).as("first_iso"),
        min(col("iso_tokyo")).as("first_iso_tokyo"),
        min(col("instant_preserved")).as("instant_preserved"),
        min(col("wall_roundtrip")).as("wall_roundtrip"))
  }

  val sc19Sql: String =
    """WITH z AS (
      |  SELECT
      |    CASE user_id % 3 WHEN 0 THEN 'UTC' WHEN 1 THEN 'Asia/Tokyo'
      |         ELSE 'Asia/Kolkata' END AS zone,
      |    CASE user_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 540 ELSE 330 END AS offm,
      |    date_trunc('second', ts) AS ts
      |  FROM events),
      |r AS (
      |  SELECT zone,
      |    hour(ts + to_minutes(offm)) AS hr,
      |    strftime(ts + to_minutes(offm), '%Y-%m-%dT%H:%M:%S') ||
      |      CASE WHEN offm = 0 THEN 'Z'
      |           ELSE '+' || lpad(CAST(offm // 60 AS VARCHAR), 2, '0') || ':'
      |                || lpad(CAST(offm % 60 AS VARCHAR), 2, '0') END AS iso,
      |    strftime(ts + to_minutes(540), '%Y-%m-%dT%H:%M:%S') || '+09:00'
      |      AS iso_tokyo
      |  FROM z)
      |SELECT zone, hr, count(*) AS cnt,
      |  min(iso) AS first_iso,
      |  min(iso_tokyo) AS first_iso_tokyo,
      |  TRUE AS instant_preserved,
      |  TRUE AS wall_roundtrip
      |FROM r GROUP BY zone, hr""".stripMargin

  // ----------------------------------------- sc20 spooky_hash_v2
  /** SpookyHashV2 varbinary scalars (reference
    * `scalar/VarbinaryFunctions.java:389,399`). The oracle engine has
    * no SpookyHash, so correctness splits hll1-style: the reference's
    * own published test vectors (TestVarbinaryFunctions.java:780-795)
    * are asserted as engine-computed booleans the oracle pins TRUE,
    * and the distributed run over customer names is gated by 64-bit
    * distinct-cardinality (a 64-bit hash collision over 10^4 inputs is
    * a one-in-10^11 event; a wrong implementation still hashes
    * injectively, so the REAL check is the vectors). */
  def sc20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
      .agg(
        max(expr("hex(spooky_hash_v2_32(encode('', 'UTF-8')))") === "6BF50919")
          .as("v32_empty"),
        max(expr("hex(spooky_hash_v2_32(encode('hello', 'UTF-8')))") === "D382E6CA")
          .as("v32_hello"),
        max(expr("hex(spooky_hash_v2_64(encode('', 'UTF-8')))") === "232706FC6BF50919")
          .as("v64_empty"),
        max(expr("hex(spooky_hash_v2_64(encode('hello', 'UTF-8')))") === "3768826AD382E6CA")
          .as("v64_hello"),
        countDistinct(expr("spooky_hash_v2_64(encode(c_name, 'UTF-8'))"))
          .as("n64_distinct"),
        count(lit(1)).as("n"))

  val sc20Sql: String =
    """SELECT TRUE AS v32_empty, TRUE AS v32_hello,
      |  TRUE AS v64_empty, TRUE AS v64_hello,
      |  count(DISTINCT c_name) AS n64_distinct, count(*) AS n
      |FROM customer""".stripMargin

  // --------------------------------------- sc21 compat alias pack
  /** Exact-name registry compatibility (r13 audit vs the reference's
    * `@ScalarFunction` inventory under `operator/scalar/`): the alias
    * spellings added in [[graft.functions.CompatAliases]] exercised
    * over real columns and pinned value-for-value against the oracle
    * engine's native equivalents — ISO dow/doy/week/year_of_week,
    * strpos/codepoint, combine_hash, logical/arithmetic shifts,
    * truncate, to_unixtime, millisecond (via from_unixtime_nanos),
    * big-endian and base64url codecs, split_to_map, trim_array, and
    * the JSONPath extract family. */
  def sc21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        expr("day_of_week(o_orderdate)").as("dw"),
        expr("day_of_year(o_orderdate)").as("dy"),
        expr("week(o_orderdate)").as("wk"),
        expr("year_of_week(o_orderdate)").as("yw"),
        expr("strpos(o_orderpriority, '-')").as("sp"),
        expr("codepoint(substring(o_orderstatus, 1, 1))").cast("long").as("cp"),
        expr("combine_hash(o_orderkey, o_custkey)").as("ch"),
        expr("bitwise_left_shift(o_orderkey % 16, 2)").as("bl"),
        expr("bitwise_right_shift(o_orderkey, 2)").as("br"),
        expr("truncate(CAST(o_totalprice AS DOUBLE) / 100)").as("tr"),
        expr("to_unixtime(CAST(o_orderdate AS TIMESTAMP))").as("ut"),
        expr("millisecond(from_unixtime_nanos(o_orderkey * 1234567))").as("ms"),
        expr("hex(to_big_endian_64(o_orderkey))").as("hb"),
        expr("from_big_endian_64(to_big_endian_64(o_custkey))").as("rb"),
        expr("to_base64url(to_big_endian_32(CAST(o_orderkey AS INT)))").as("bu"),
        expr("element_at(split_to_map(concat('k=', o_orderstatus, ',x=1'), ',', '='), 'k')")
          .as("sm"),
        expr("array_join(trim_array(array(1, 2, 3), 1), ',')").as("ta"),
        expr("json_extract_scalar(concat('{\"k\":', o_orderkey, '}'), '$.k')").as("je"),
        expr("json_array_get(concat('[', o_custkey, ',', o_orderkey, ']'), -1)").as("jg"))

  val sc21Sql: String =
    """SELECT o_orderkey,
      |  CAST(isodow(o_orderdate) AS BIGINT) AS dw,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS dy,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
      |  CAST(isoyear(o_orderdate) AS BIGINT) AS yw,
      |  CAST(strpos(o_orderpriority, '-') AS BIGINT) AS sp,
      |  CAST(unicode(substring(o_orderstatus, 1, 1)) AS BIGINT) AS cp,
      |  31 * o_orderkey + o_custkey AS ch,
      |  (o_orderkey % 16) << 2 AS bl,
      |  o_orderkey >> 2 AS br,
      |  trunc(CAST(o_totalprice AS DOUBLE) / 100) AS tr,
      |  CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS DOUBLE) / 1000000 AS ut,
      |  ((o_orderkey * 1234567) // 1000 % 1000000) // 1000 AS ms,
      |  upper(printf('%016x', o_orderkey)) AS hb,
      |  o_custkey AS rb,
      |  replace(replace(to_base64(unhex(printf('%08x', o_orderkey))), '+', '-'), '/', '_') AS bu,
      |  o_orderstatus AS sm,
      |  '1,2' AS ta,
      |  CAST(o_orderkey AS VARCHAR) AS je,
      |  CAST(o_orderkey AS VARCHAR) AS jg
      |FROM orders WHERE o_orderkey <= 1000""".stripMargin

  // --------------------------- sc22 registry compat, second batch
  /** r13 audit stragglers under the oracle gate: the lambda predicates
    * all_match/any_match/none_match (→ forall/exists, identical
    * three-valued logic) and varbinary sha256 (→ unhex(sha2)); the
    * oracle engine lacks sha512/murmur3, so those are pinned by unit
    * vectors instead (FunctionsSpec). */
  def sc22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(
        col("n_name"),
        expr("all_match(array(n_nationkey, n_regionkey), x -> x >= 0)").as("am"),
        expr("any_match(array(n_nationkey, n_regionkey), x -> x > 20)").as("anym"),
        expr("none_match(array(n_nationkey, n_regionkey), x -> x > 20)").as("nm"),
        expr("all_match(array(n_nationkey, CAST(NULL AS BIGINT)), x -> x >= 0)").as("am_null"),
        expr("lower(hex(sha256(encode(n_name, 'UTF-8'))))").as("sha"),
        expr("infinity() > 1e308").as("inf_pos"))

  val sc22Sql: String =
    """SELECT n_name,
      |  TRUE AS am,
      |  n_nationkey > 20 AS anym,
      |  NOT (n_nationkey > 20) AS nm,
      |  CAST(NULL AS BOOLEAN) AS am_null,
      |  sha256(n_name) AS sha,
      |  TRUE AS inf_pos
      |FROM nation""".stripMargin

  // --------------------------- sc23 SQL/JSON 2016 path language
  /** The FULL path language behind json_value/json_query/json_exists
    * (reference `io/trino/json/PathEvaluationVisitor.java`, grammar
    * `jsonpath/JsonPath.g4`; evaluator `functions/JsonPathEval.scala`,
    * conformance-pinned by JsonPathSpec's reference-vector replay):
    * filters `?(@ ...)`, wildcards, `last`, item methods, arithmetic,
    * strict-vs-lax. Docs are BUILT from source columns, so the oracle
    * recomputes every expected value from the same raw columns —
    * ground truth, not a second JSON-path engine. */
  def sc23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        concat(lit("""{"a":{"b":"""), col("l_quantity"),
          lit(""","c":[1,2,"""), col("l_linenumber"),
          lit("""]},"tags":["x","y"]}""")).as("j"))
      .selectExpr(
        "l_orderkey", "l_linenumber",
        "json_value(j, 'lax $.a.b') AS v_member",
        "json_value(j, 'lax $.a.c[2]') AS v_idx",
        "json_value(j, 'lax $.a.c[last]') AS v_last",
        // filter: elements (1,2,ln) > 2 — singleton iff ln > 2
        "json_value(j, 'lax $.a.c[*]?(@ > 2)') AS v_filter",
        "json_value(j, 'lax $.a.c.size()') AS v_size",
        "json_value(j, 'lax $.a.type()') AS v_type",
        "json_value(j, 'lax $.a.b + 1') AS v_arith",
        "json_exists(j, 'strict $.a.c[5]') AS e_strict_oob",
        "json_exists(j, 'lax $.tags[*]?(@ starts with \"x\")') AS e_starts",
        "json_exists(j, 'lax $.a.c[*]?(@ > 2 && @ < 100)') AS e_band",
        "json_query(j, 'lax $.a.c') AS q_arr")

  val sc23Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS VARCHAR) AS v_member,
      |  CAST(l_linenumber AS VARCHAR) AS v_idx,
      |  CAST(l_linenumber AS VARCHAR) AS v_last,
      |  CASE WHEN l_linenumber > 2 THEN CAST(l_linenumber AS VARCHAR) END AS v_filter,
      |  '3' AS v_size,
      |  'object' AS v_type,
      |  CAST(l_quantity + 1.0 AS VARCHAR) AS v_arith,
      |  FALSE AS e_strict_oob,
      |  TRUE AS e_starts,
      |  l_linenumber > 2 AS e_band,
      |  '[1,2,' || l_linenumber || ']' AS q_arr
      |FROM lineitem WHERE l_orderkey < 200""".stripMargin

  // --------------------------- sc24 round-14 string/datetime compat
  /** The r14 conformance-fix surface under the full hash gate: Unicode
    * chr/codepoint (reference StringFunctions; Spark's builtin chr is
    * mod-256), levenshtein_distance (BIGINT), reference-order two-arg
    * ltrim/rtrim (charset semantics), in-range split_part, and the
    * MySQL-%-pattern date_format (DateTimeFunctions) — each spelled
    * with a DuckDB function of IDENTICAL semantics on these inputs
    * (chr/ascii/levenshtein/ltrim/split_part/strftime). */
  def sc24(s: SparkSession, dir: String): DataFrame = {
    graft.engine.Graft.registerAll(s, dir)
    t(s, dir, "orders").filter(col("o_orderkey") < 2000)
      .selectExpr(
        "o_orderkey",
        "chr(65 + o_orderkey % 26) AS ch",
        "chr(9731 + o_orderkey % 16) AS uch",
        "CAST(codepoint(chr(9731 + o_orderkey % 16)) AS BIGINT) AS ucp",
        "levenshtein_distance(o_orderpriority, '1-URGENT') AS lev",
        "split_part(o_orderpriority, '-', 1) AS pri_num",
        "split_part(o_orderpriority, '-', 2) AS pri_word",
        "ltrim(o_orderpriority, '0123456789-') AS word2",
        "rtrim(o_orderpriority, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ-') AS num2",
        "date_format(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS ymd",
        "date_format(CAST(o_orderdate AS TIMESTAMP), '%d/%m/%Y') AS dmy")
  }

  val sc24Sql: String =
    """SELECT o_orderkey,
      |  chr(65 + CAST(o_orderkey % 26 AS INT)) AS ch,
      |  chr(9731 + CAST(o_orderkey % 16 AS INT)) AS uch,
      |  CAST(ascii(chr(9731 + CAST(o_orderkey % 16 AS INT))) AS BIGINT) AS ucp,
      |  CAST(levenshtein(o_orderpriority, '1-URGENT') AS BIGINT) AS lev,
      |  split_part(o_orderpriority, '-', 1) AS pri_num,
      |  split_part(o_orderpriority, '-', 2) AS pri_word,
      |  ltrim(o_orderpriority, '0123456789-') AS word2,
      |  rtrim(o_orderpriority, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ-') AS num2,
      |  strftime(o_orderdate, '%Y-%m-%d') AS ymd,
      |  strftime(o_orderdate, '%d/%m/%Y') AS dmy
      |FROM orders WHERE o_orderkey < 2000""".stripMargin

  // --------------------------- sc25 SQL/JSON 2016 clause surface
  /** The r14 clause grammar under the full hash gate: PASSING
    * variables (in filters, arithmetic, and subscripts), DEFAULT ...
    * ON EMPTY / ON ERROR, RETURNING, array wrappers, OMIT QUOTES, and
    * the json_object / json_array constructors (sqlcompat/
    * SqlJsonClauses.scala + functions/JsonPathEval.scala named
    * variables). Docs are BUILT from source columns, so the DuckDB
    * oracle recomputes every expected value from the same raw columns
    * — ground truth, not a second SQL/JSON engine. */
  def sc25(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        concat(lit("""{"a":{"c":[1,2,"""), col("l_linenumber"),
          lit("""]},"tags":["x","y"]}""")).as("j"))
      .createOrReplaceTempView("graft_sc25_docs")
    s.sql(graft.sqlcompat.Dialect.translate(
      """SELECT l_orderkey, l_linenumber,
        |  json_value(j, 'strict $.a.c[*]?(@ > $cut)'
        |    PASSING 2 AS "cut"
        |    DEFAULT 'none' ON EMPTY DEFAULT 'err' ON ERROR) AS v_pass,
        |  json_value(j, 'strict $.a.c[$i - 1] + $off'
        |    PASSING l_linenumber AS "i", 10 AS "off"
        |    RETURNING bigint DEFAULT -1 ON EMPTY DEFAULT -2 ON ERROR) AS v_ret,
        |  json_exists(j, 'strict $.a.c[$i]'
        |    PASSING l_linenumber AS "i" FALSE ON ERROR) AS e_idx,
        |  json_query(j, 'lax $.a.c[*]?(@ > 2)'
        |    WITH UNCONDITIONAL ARRAY WRAPPER EMPTY ARRAY ON EMPTY) AS q_wrap,
        |  json_query(j, 'lax $.tags[0]' OMIT QUOTES) AS q_unq,
        |  json_object('k' : l_linenumber, 'w' : l_returnflag) AS obj,
        |  json_array(l_linenumber, 'tag', l_linenumber > 2) AS arr
        |FROM graft_sc25_docs""".stripMargin))
  }

  val sc25Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_linenumber > 2 THEN CAST(l_linenumber AS VARCHAR)
      |       ELSE 'none' END AS v_pass,
      |  CAST(CASE WHEN l_linenumber <= 3 THEN l_linenumber + 10
      |       ELSE -2 END AS BIGINT) AS v_ret,
      |  l_linenumber <= 2 AS e_idx,
      |  CASE WHEN l_linenumber > 2 THEN '[' || l_linenumber || ']'
      |       ELSE '[]' END AS q_wrap,
      |  'x' AS q_unq,
      |  json_object('k', l_linenumber, 'w', l_returnflag) AS obj,
      |  json_array(l_linenumber, 'tag', l_linenumber > 2) AS arr
      |FROM lineitem WHERE l_orderkey < 200""".stripMargin

  // ------------------------------------------------------------- exports
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sc1_datetime" -> sc1 _,
    "sc2_strings" -> sc2 _,
    "sc3_regex" -> sc3 _,
    "sc4_math" -> sc4 _,
    "sc5_array_hof" -> sc5 _,
    "sc6_maps" -> sc6 _,
    "sc7_crypto" -> sc7 _,
    "sc8_conditional" -> sc8 _,
    "sc9a_registry_udfs" -> sc9a _,
    "sc9b_registry_engine" -> sc9b _,
    "sc10_epoch" -> sc10 _,
    "sc11_strdist" -> sc11 _,
    "sc12_sizes_dists" -> sc12 _,
    "sc13_json_family" -> sc13 _,
    "sc14_sql_json" -> sc14 _,
    "sc15_url_extract" -> sc15 _,
    "sc16_timezone" -> sc16 _,
    "sc17_soundex" -> sc17 _,
    "sc18_durations" -> sc18 _,
    "sc19_timestamptz" -> sc19 _,
    "sc20_spooky_hash" -> sc20 _,
    "sc21_registry_compat" -> sc21 _,
    "sc22_registry_compat2" -> sc22 _,
    "sc23_json_path" -> sc23 _,
    "sc24_compat_r14" -> sc24 _,
    "sc25_sql_json_clauses" -> sc25 _)

  val oracle: Map[String, String] = Map(
    "sc1_datetime" -> sc1Sql,
    "sc2_strings" -> sc2Sql,
    "sc3_regex" -> sc3Sql,
    "sc4_math" -> sc4Sql,
    "sc5_array_hof" -> sc5Sql,
    "sc6_maps" -> sc6Sql,
    "sc7_crypto" -> sc7Sql,
    "sc8_conditional" -> sc8Sql,
    "sc9a_registry_udfs" -> sc9aSql,
    // sc9b is rows-only: stems and lang-id are engine-specific
    "sc10_epoch" -> sc10Sql,
    "sc11_strdist" -> sc11Sql,
    "sc12_sizes_dists" -> sc12Sql,
    "sc13_json_family" -> sc13Sql,
    "sc14_sql_json" -> sc14Sql,
    "sc15_url_extract" -> sc15Sql,
    "sc16_timezone" -> sc16Sql,
    "sc17_soundex" -> sc17Sql,
    "sc18_durations" -> sc18Sql,
    "sc19_timestamptz" -> sc19Sql,
    "sc20_spooky_hash" -> sc20Sql,
    "sc21_registry_compat" -> sc21Sql,
    "sc22_registry_compat2" -> sc22Sql,
    "sc23_json_path" -> sc23Sql,
    "sc24_compat_r14" -> sc24Sql,
    "sc25_sql_json_clauses" -> sc25Sql)
}
