package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.engine.Num._

/** Aggregate-function inventory beyond sum/avg/count/min/max: min_by/
  * max_by, boolean and bitwise aggregates, count_if, statistical
  * aggregates, approximate (sketch) aggregates with error-bound
  * verification, ordered array_agg / listagg, and histogram/map_agg.
  *
  * Capability match (SURVEY §2.4, reference `operator/aggregation/`):
  * MinByAggregationFunction.java / MaxByAggregationFunction.java,
  * BooleanAndAggregation.java / BooleanOrAggregation.java,
  * BitwiseAndAggregation.java, CountIfAggregation.java,
  * VarianceAggregation.java / DoubleCorrelationAggregation.java /
  * DoubleCovarianceAggregation.java / GeometricMeanAggregations.java,
  * ApproximateCountDistinctAggregation.java (error-bound constants at
  * :47-48 — we assert the same style of bound, not bit equality, since
  * sketches are engine-specific), ApproximateLongPercentileAggregations
  * .java, arrayagg/ArrayAggregationFunction.java + OrderedAccumulator
  * Factory.java (ordered aggregates), listagg/, histogram/TypedHistogram
  * .java, MapAggregationFunction.java.
  *
  * Determinism discipline: statistical aggregates over doubles are
  * order-dependent in the low ulps, so cross-engine comparisons use
  * (a) exact decimal moments (sums of decimal products) pushed through
  * one identical IEEE formula, and (b) native engine implementations
  * only under a coarse round(). Sketch outputs are compared via
  * error-bound predicates (both engines must land within the bound),
  * mirroring the reference's approx-aggregate test protocol.
  *
  * Scale notes (100 TB): every query is a single partial/final hash
  * aggregation — min_by/bool/bit/count_if/moments all have O(1)
  * per-group state and map-side combine; collect_list-based ordered
  * aggregates are bounded here by group size (customers per nation);
  * the sketches (HLL, KLL) are O(kB) mergeable state — exactly why
  * they exist at this scale.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  // -------------------------------------------------- ag1 min_by/max_by
  /** min_by/max_by with a unique ordering key (deterministic), plus
    * plain string min/max, plus the reference's N-variants
    * `min_by(x, y, n)` / `max_by(x, y, n)` (reference
    * `operator/aggregation/minmaxbyn/`) as the bounded-heap
    * TypedImperativeAggregates `min_by_n`/`max_by_n`
    * (functions/MinMaxByN.scala) — O(n) state per group regardless of
    * group size, unlike the collect_list composition this replaced,
    * whose buffer grew linearly with the group. */
  def ag1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        min_by(col("c_name"), col("c_custkey")).as("first_customer"),
        max_by(col("c_name"), col("c_custkey")).as("last_customer"),
        min(col("c_name")).as("min_name"),
        max(col("c_name")).as("max_name"),
        count(lit(1)).as("cnt"),
        call_function("min_by_n", col("c_name"), col("c_custkey"), lit(3))
          .as("firsts"),
        call_function("max_by_n", col("c_name"), col("c_custkey"), lit(3))
          .as("lasts"))
      .select(col("c_nationkey"), col("first_customer"), col("last_customer"),
        col("min_name"), col("max_name"), col("cnt"),
        concat_ws(",", col("firsts")).as("first3"),
        concat_ws(",", col("lasts")).as("last3"))

  val ag1Sql: String =
    """SELECT c_nationkey,
      |  min_by(c_name, c_custkey) AS first_customer,
      |  max_by(c_name, c_custkey) AS last_customer,
      |  min(c_name) AS min_name,
      |  max(c_name) AS max_name,
      |  count(*) AS cnt,
      |  array_to_string((list(c_name ORDER BY c_custkey))[1:3], ',') AS first3,
      |  array_to_string((list(c_name ORDER BY c_custkey DESC))[1:3], ',') AS last3
      |FROM customer GROUP BY c_nationkey""".stripMargin

  // ----------------------------------------- ag2 bool/bit aggregates
  /** bool_and / bool_or / bit_and / bit_or / bit_xor / count_if. */
  def ag2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_discount") <= 0.1).as("all_small_disc"),
        bool_or(col("l_quantity") > 49).as("any_huge_qty"),
        bit_and(col("l_orderkey")).as("keys_and"),
        bit_or(col("l_orderkey")).as("keys_or"),
        bit_xor(col("l_orderkey")).as("keys_xor"),
        count_if(col("l_tax") > 0.05).as("high_tax_cnt"))

  val ag2Sql: String =
    """SELECT l_returnflag,
      |  bool_and(l_discount <= 0.1) AS all_small_disc,
      |  bool_or(l_quantity > 49) AS any_huge_qty,
      |  bit_and(l_orderkey) AS keys_and,
      |  bit_or(l_orderkey) AS keys_or,
      |  bit_xor(l_orderkey) AS keys_xor,
      |  CAST(count_if(l_tax > 0.05) AS BIGINT) AS high_tax_cnt
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ------------------------------------------- ag3 statistical aggs
  /** Statistical aggregates two ways: exact decimal moments pushed
    * through one shared IEEE formula (order-independent — the
    * distributed-determinism trick), plus the native streaming
    * implementations under a coarse round() as a sanity cross-check.
    * Covers var_samp/var_pop/stddev/corr/covar/geometric_mean. */
  def ag3(s: SparkSession, dir: String): DataFrame = {
    // Moment sums in unscaled-long space (see Num's limb machinery):
    // uq <= 5e3, up <= 1.1e7 scale-2 units, so every product below
    // (uq*uq scale 4, up*up scale 4, uq*up scale 4) fits a long per
    // row with 4+ orders of magnitude to spare, and each sum runs as
    // primitive limb accumulators instead of per-row BigDecimal.
    // up*up reaches ~1.2e14/row (two-limb hi ~1.2e8 → wraps at ~8e10
    // rows/group), so it takes the three-limb path, good to ~9e13
    // rows/group; the narrower products stay on the cheaper two-limb
    // path (uq*up hi ~5.5e4 → ~1.7e14 rows, uq*uq trivially safe).
    val uq = unscaled2dp(col("l_quantity"))
    val up = unscaled2dp(col("l_extendedprice"))
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        decSumLong(uq, 2).as("s1"), decSumLong(uq * uq, 4).as("s2"),
        decSumLong(up, 2).as("p1"), decSumLong3(up * up, 4).as("p2"),
        decSumLong(uq * up, 4).as("sqp"),
        round(stddev_samp(col("l_quantity")), 4).as("stddev_native"),
        round(var_pop(col("l_quantity")), 4).as("varpop_native"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_native"))
      .select(
        col("l_linestatus"), col("n"),
        // var_samp = (n*Σx² − (Σx)²) / (n(n−1)) — every operand exact
        ((col("n") * col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double")) /
          (col("n") * (col("n") - 1))).as("var_exact"),
        // covar_pop = (n*Σxy − ΣxΣy) / n²
        ((col("n") * col("sqp").cast("double") -
          col("s1").cast("double") * col("p1").cast("double")) /
          (col("n") * col("n"))).as("covar_exact"),
        col("stddev_native"), col("varpop_native"), col("corr_native"))
  }

  val ag3Sql: String =
    """SELECT l_linestatus, n,
      |  (n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (n * (n - 1)) AS var_exact,
      |  (n * CAST(sqp AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(p1 AS DOUBLE)) / (n * n) AS covar_exact,
      |  stddev_native, varpop_native, corr_native
      |FROM (
      |  SELECT l_linestatus, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS s1,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS s2,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS p1,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS p2,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sqp,
      |    round(stddev_samp(l_quantity), 4) AS stddev_native,
      |    round(var_pop(l_quantity), 4) AS varpop_native,
      |    round(corr(l_quantity, l_extendedprice), 6) AS corr_native
      |  FROM lineitem GROUP BY l_linestatus) m""".stripMargin

  // ------------------------------------- ag4 approx sketches w/ bounds
  /** Sketch aggregates verified by error bound, not bit equality
    * (sketch layouts are engine-specific): approx_count_distinct must
    * land within 10% of the exact distinct count, approx median within
    * the exact p25..p75 band. Both engines evaluate their own sketch
    * against their own exact values → both emit the same booleans.
    * At 100 TB these sketches are THE scalable path: O(kB) mergeable
    * state vs an exact distinct's full shuffle. */
  def ag4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    // count(DISTINCT) deliberately SPLIT from the sketch aggregates:
    // planned in one Aggregate, Spark's distinct rewrite groups phase 1
    // by the distinct key and builds every typed sketch PER KEY (~100k
    // percentile/HLL/quantile buffers, measured 2.3 s vs 0.5 s split at
    // sf0.1 — and O(|keys| · sketch) state at scale, the opposite of
    // what a sketch is for). Two single-row aggregates + cross join of
    // 1×1 frames keeps both passes map-side-combinable.
    val exact = o.agg(countDistinct(col("o_custkey")).as("exact_cust"))
    val sk = o.agg(
      approx_count_distinct(col("o_custkey")).as("apx"),
      // accuracy 2000 ≈ 0.05% rank error — orders of magnitude inside
      // the IQR bound below, at a fraction of the 10000-bucket cost
      percentile_approx(col("o_totalprice"), lit(0.5), lit(2000)).as("apx_med"),
      // one sort-aggregate pass for both exact bounds
      expr("exact_quantiles(o_totalprice, array(0.25, 0.75))").as("qs"))
    exact.join(sk)
      .select(
        col("exact_cust"),
        (abs(col("apx") - col("exact_cust")) <= col("exact_cust") * 0.1).as("cd_within_10pct"),
        (col("apx_med") >= col("qs")(0) && col("apx_med") <= col("qs")(1)).as("median_in_iqr"))
  }

  val ag4Sql: String =
    """SELECT exact_cust,
      |  abs(apx - exact_cust) <= exact_cust * 0.1 AS cd_within_10pct,
      |  apx_med >= p25 AND apx_med <= p75 AS median_in_iqr
      |FROM (
      |  SELECT count(DISTINCT o_custkey) AS exact_cust,
      |    approx_count_distinct(o_custkey) AS apx,
      |    approx_quantile(o_totalprice, 0.5) AS apx_med,
      |    quantile_cont(o_totalprice, 0.25) AS p25,
      |    quantile_cont(o_totalprice, 0.75) AS p75
      |  FROM orders) a""".stripMargin

  // ------------------------------------ ag5 ordered array_agg/listagg
  /** Ordered aggregates: listagg(name ORDER BY name) and
    * array_agg(name ORDER BY balance,key) — Spark expresses ORDER BY
    * inside an aggregate as sort_array/array_sort over collected
    * structs (SURVEY §2.4: OrderedAccumulatorFactory mapping). */
  def ag5(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("c_name")))).as("names_alpha"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("c_acctbal"), col("c_custkey"), col("c_name")))),
            x => x.getField("c_name"))).as("names_by_balance"))

  val ag5Sql: String =
    """SELECT c_nationkey,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names_alpha,
      |  string_agg(c_name, ',' ORDER BY c_acctbal, c_custkey) AS names_by_balance
      |FROM customer WHERE c_custkey <= 300
      |GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------- ag6 histogram/map_agg
  /** histogram / map_agg equivalence: per-key counts rendered as a
    * canonical sorted "k:v" string (maps don't have a stable
    * cross-engine literal form; the composition groupBy→count→
    * map_from_entries IS Spark's histogram). */
  def ag6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .select(concat(col("o_orderpriority"), lit(":"), col("c")).as("kv"))
      .agg(concat_ws(",", array_sort(collect_list(col("kv")))).as("histogram"))

  val ag6Sql: String =
    """SELECT string_agg(kv, ',' ORDER BY kv) AS histogram FROM (
      |  SELECT o_orderpriority || ':' || count(*) AS kv
      |  FROM orders GROUP BY o_orderpriority) h""".stripMargin

  // ---------------------------------------- ag7 regression + moments
  /** regr_slope / regr_intercept / skewness / kurtosis from exact
    * decimal raw moments pushed through one shared IEEE formula.
    * Spark's native skewness/kurtosis are population (g1/g2) while the
    * oracle engine's are sample-adjusted (G1/G2) — a DEFINITIONAL
    * mismatch, so both engines compute the population form from the
    * same exact sums (Σx..Σx⁴ in DECIMAL(4,2)-derived precision, which
    * keeps x⁴ inside 38 digits). Reference:
    * DoubleRegressionAggregation.java, CentralMomentsAggregation.java. */
  def ag7(s: SparkSession, dir: String): DataFrame = {
    // Power sums in unscaled-long space: ux <= 5e3 scale-2 units, so
    // even ux^4 (scale-8 units) tops out at 6.25e14 per row — far
    // inside a long — while the DECIMAL type of x^4 would be (19,8),
    // past Spark's long-backed precision 18 and into per-row
    // BigDecimal. ux^4's two-limb hi would reach ~6.3e8/row (wraps at
    // ~1.5e10 rows/group), so it takes Num's three-limb path
    // (~9e13 rows/group); the lower powers stay two-limb (ux^3 hi
    // ~1.25e5 → ~7e13 rows, the rest far safer).
    val ux = unscaled2dp(col("l_quantity"))
    val uy = unscaled2dp(col("l_extendedprice"))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        decSumLong(ux, 2).as("sx"), decSumLong(ux * ux, 4).as("sx2"),
        decSumLong(ux * ux * ux, 6).as("sx3"),
        decSumLong3(ux * ux * ux * ux, 8).as("sx4"),
        decSumLong(uy, 2).as("sy"), decSumLong(ux * uy, 4).as("sxy"))
      .selectExpr(
        "l_returnflag", "n",
        // slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²); intercept = (Σy − slope·Σx)/n
        """(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope""",
        """(CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n AS intercept""",
        // central moments from raw: m_k = E[(x−μ)^k]
        "CAST(sx AS DOUBLE) / n AS mu",
        "CAST(sx2 AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m2",
        """CAST(sx3 AS DOUBLE) / n - 3 * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
           + 2 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m3""",
        """CAST(sx4 AS DOUBLE) / n - 4 * (CAST(sx AS DOUBLE) / n) * (CAST(sx3 AS DOUBLE) / n)
           + 6 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
           - 3 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m4""")
      .selectExpr(
        "l_returnflag", "n", "slope", "intercept",
        // sx3/sx4 exceed 2^53 of significand: decimal→double conversion
        // double-rounds differently across engines → compare under
        // round(·,9) (values are O(1))
        "round(m3 / (m2 * sqrt(m2)), 9) AS skew_pop",
        "round(m4 / (m2 * m2) - 3, 9) AS kurt_pop")
  }

  val ag7Sql: String =
    """SELECT l_returnflag, n, slope, intercept,
      |  round(m3 / (m2 * sqrt(m2)), 9) AS skew_pop,
      |  round(m4 / (m2 * m2) - 3, 9) AS kurt_pop
      |FROM (
      |  SELECT l_returnflag, n,
      |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |    (CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n AS intercept,
      |    CAST(sx2 AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m2,
      |    CAST(sx3 AS DOUBLE) / n - 3 * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
      |      + 2 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m3,
      |    CAST(sx4 AS DOUBLE) / n - 4 * (CAST(sx AS DOUBLE) / n) * (CAST(sx3 AS DOUBLE) / n)
      |      + 6 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx2 AS DOUBLE) / n)
      |      - 3 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS m4
      |  FROM (
      |    SELECT l_returnflag, count(*) AS n,
      |      sum(CAST(l_quantity AS DECIMAL(4,2))) AS sx,
      |      sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS sx2,
      |      sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS sx3,
      |      sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS sx4,
      |      sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
      |      sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      |    FROM lineitem GROUP BY l_returnflag) raw) m""".stripMargin

  // ------------------------------------------------ ag8 checksum agg
  /** Order-independent table checksum (reference
    * `ChecksumAggregationFunction.java` — used there to compare result
    * sets regardless of row order; the same need this engine's own
    * oracle gate has). Per-row digest = first 12 hex chars of md5 of a
    * canonical row rendering; the aggregate is a plain sum, so it is
    * commutative/associative → identical on any partitioning and in
    * both engines. */
  def ag8(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .selectExpr(
        """CAST(conv(substring(md5(concat_ws('|',
           |  CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),
           |  o_orderstatus, o_orderpriority)), 1, 12), 16, 10) AS BIGINT) AS rh""".stripMargin)
      // accumulate in DECIMAL(38,0): a bigint sum of 2^48-scale digests
      // overflows past ~30k rows; decimal is exact at any row count
      .agg(sum(col("rh").cast("decimal(38,0)")).cast("string").as("checksum"),
        count(lit(1)).as("n"))

  val ag8Sql: String =
    """SELECT CAST(CAST(sum(rh) AS DECIMAL(38,0)) AS VARCHAR) AS checksum, count(*) AS n FROM (
      |  SELECT CAST(('0x' || substring(md5(concat_ws('|',
      |    CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
      |    o_orderstatus, o_orderpriority)), 1, 12)) AS BIGINT) AS rh
      |  FROM orders) r""".stripMargin

  // ------------------------------------------------------------- exports
  // ----------------------------------- ag9 streaming numeric histogram
  /** numeric_histogram(buckets, v) — the Ben-Haim & Tom-Tov streaming
    * histogram (reference NumericHistogramAggregation.java) as a
    * custom TypedImperativeAggregate. l_quantity has 50 distinct
    * values < 64 buckets, so the sketch is in its EXACT regime at any
    * SF: each centroid is a true value count, and the oracle pins the
    * full histogram against a plain GROUP BY — rendered as canonical
    * comma-joined strings so both engines serialize identically. */
  def ag9(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(expr("numeric_histogram(64, l_quantity)").as("h"))
      .select(
        concat_ws(",", expr("transform(map_keys(h), x -> CAST(x AS STRING))")).as("qs"),
        concat_ws(",", expr("transform(map_values(h), x -> CAST(x AS STRING))")).as("cs"))

  val ag9Sql: String =
    """SELECT
      |  array_to_string(list_transform(list(q ORDER BY q), x -> CAST(x AS VARCHAR)), ',') AS qs,
      |  array_to_string(list_transform(list(c ORDER BY q), x -> CAST(x AS VARCHAR)), ',') AS cs
      |FROM (
      |  SELECT l_quantity AS q, CAST(count(*) AS DOUBLE) AS c
      |  FROM lineitem GROUP BY l_quantity) t""".stripMargin

  // ------------------------------- ag10 map_union / multimap / reduce
  /** The map-typed aggregate family plus the generic reduction
    * (reference MapUnionAggregation.java, multimapagg/,
    * ReduceAggregationFunction.java): per-row singleton maps union
    * into one map (values are a pure function of the key, so
    * first-wins is conflict-free and deterministic), multimap_agg
    * groups order keys under their priority (sorted at render for a
    * stable hash), and reduce_agg folds exact integer sum/max through
    * user closures. One aggregation pass for the maps + one for the
    * per-key reductions, joined on the 5-row priority set. */
  def ag10(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val longEnc = Encoders.scalaLong
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderpriority").as("prio"), col("o_orderkey"))
      .withColumn("m", map(col("prio"), length(col("prio")).cast("long")))
    val maps = o
      .agg(expr("map_union(m)").as("u"),
        expr("multimap_agg(prio, o_orderkey)").as("mm"))
      .select(explode(map_entries(col("u"))).as("e"), col("mm"))
      .select(col("e.key").as("prio"), col("e.value").as("plen"),
        array_sort(element_at(col("mm"), col("e.key"))).as("oklist"))
      .select(col("prio"), col("plen"),
        size(col("oklist")).cast("long").as("n_oks"),
        concat_ws(",", expr("transform(oklist, x -> CAST(x AS STRING))"))
          .as("oks"))
    val red = o.groupBy(col("prio"))
      .agg(
        graft.functions.ReduceAgg.reduceAgg[Long, Long](
          0L, _ + _, _ + _)(col("o_orderkey")).as("rsum"),
        graft.functions.ReduceAgg.reduceAgg[Long, Long](
          Long.MinValue, math.max, math.max)(col("o_orderkey")).as("rmax"))
    maps.join(red, "prio")
  }

  val ag10Sql: String =
    """SELECT o_orderpriority AS prio,
      |  CAST(len(o_orderpriority) AS BIGINT) AS plen,
      |  count(*) AS n_oks,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS oks,
      |  CAST(sum(o_orderkey) AS BIGINT) AS rsum,
      |  CAST(max(o_orderkey) AS BIGINT) AS rmax
      |FROM orders WHERE o_orderkey <= 2000
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------- ag11 compat agg aliases
  /** Aggregate spellings from the r13 registry audit
    * ([[graft.functions.CompatAliases]]): approx_distinct (exact at
    * the tiny per-group cardinality used here — HLL++ sparse mode),
    * arbitrary (deterministic because its input is the group key),
    * bitwise_and_agg/bitwise_or_agg, geometric_mean (transcendental —
    * pinned under round-6 per the cross-libm rule), and the map-typed
    * histogram rendered as canonical sorted text (maps have no stable
    * cross-engine literal form; same device as ag6). */
  def ag11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 2000)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_distinct(l_linestatus)").as("ad"),
        expr("arbitrary(l_returnflag)").as("ar"),
        expr("bitwise_and_agg(l_linenumber)").cast("long").as("ba"),
        expr("bitwise_or_agg(l_linenumber)").cast("long").as("bo"),
        expr("round(geometric_mean(CAST(l_quantity AS DOUBLE)), 6)").as("gm"),
        expr("array_join(transform(array_sort(map_entries(histogram(l_linestatus))), " +
          "e -> concat(e.key, ':', e.value)), ',')").as("h"))

  val ag11Sql: String =
    """WITH src AS (
      |  SELECT * FROM lineitem WHERE l_orderkey <= 2000),
      |hist AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS c
      |  FROM src GROUP BY l_returnflag, l_linestatus)
      |SELECT s.l_returnflag,
      |  count(DISTINCT s.l_linestatus) AS ad,
      |  s.l_returnflag AS ar,
      |  CAST(bit_and(s.l_linenumber) AS BIGINT) AS ba,
      |  CAST(bit_or(s.l_linenumber) AS BIGINT) AS bo,
      |  round(exp(avg(ln(CAST(s.l_quantity AS DOUBLE)))), 6) AS gm,
      |  (SELECT string_agg(h.l_linestatus || ':' || h.c, ',' ORDER BY h.l_linestatus)
      |   FROM hist h WHERE h.l_returnflag = s.l_returnflag) AS h
      |FROM src s GROUP BY s.l_returnflag""".stripMargin

  // ----------------------------------------------- ag12 map_agg
  /** `map_agg(K, V)` under the oracle gate (reference
    * `aggregation/MapAggregationFunction.java`): keys here are unique
    * per group (nation keys within a region), so the
    * arbitrary-on-duplicates contract doesn't bite and the canonical
    * sorted-entries rendering is deterministic. */
  def ag12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(expr(
        "array_join(transform(array_sort(map_entries(map_agg(n_nationkey, n_name))), " +
          "e -> concat(e.key, ':', e.value)), ',')").as("m"))

  val ag12Sql: String =
    """SELECT n_regionkey,
      |  string_agg(n_nationkey || ':' || n_name, ',' ORDER BY n_nationkey) AS m
      |FROM nation GROUP BY n_regionkey""".stripMargin

  // ------------------------------- ag13 weighted percentile
  /** The reference's weighted form `approx_percentile(x, w, p)`
    * (`QuantileDigestAggregationFunction.java` weighted overloads):
    * each row counts w times. Delivered EXACTLY via Spark's
    * `percentile(x, p, frequency)` — one pass, per-group
    * value→frequency state, no row expansion (documented divergence:
    * exact where the reference is approximate, the same
    * stronger-contract posture as f8's exact-at-low-cardinality
    * qdigest). The oracle expands rows w times and takes the
    * continuous quantile — same multiset definition, interpolation
    * pinned under round(.,6). */
  def ag13(s: SparkSession, dir: String): DataFrame =
    // ONE array-percentile call: exact percentile is a sort-based
    // aggregate, so three scalar calls would sort the per-group
    // value→frequency state three times (measured 3.04 s → 0.90 s at
    // sf0.1 from this collapse alone).
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.25D, 0.75D), " +
        "CAST(l_quantity AS INT))").as("ps"))
      .select(col("l_returnflag"),
        expr("round(ps[0], 6)").as("wmed"),
        expr("round(ps[1], 6)").as("wp25"),
        expr("round(ps[2], 6)").as("wp75"))

  val ag13Sql: String =
    """WITH e AS (
      |  SELECT l_returnflag,
      |    unnest(list_transform(generate_series(1, CAST(l_quantity AS INT)),
      |      i -> l_extendedprice)) AS v
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  round(quantile_cont(v, 0.5), 6) AS wmed,
      |  round(quantile_cont(v, 0.25), 6) AS wp25,
      |  round(quantile_cont(v, 0.75), 6) AS wp75
      |FROM e GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ag13_weighted_percentile" -> ag13 _,
    "ag12_map_agg" -> ag12 _,
    "ag11_registry_aggs" -> ag11 _,
    "ag10_map_reduce_agg" -> ag10 _,
    "ag9_numeric_histogram" -> ag9 _,
    "ag1_minmax_by" -> ag1 _,
    "ag2_bool_bit" -> ag2 _,
    "ag3_stats" -> ag3 _,
    "ag4_approx_bounds" -> ag4 _,
    "ag5_ordered_agg" -> ag5 _,
    "ag6_histogram" -> ag6 _,
    "ag7_regression" -> ag7 _,
    "ag8_checksum" -> ag8 _)

  val oracle: Map[String, String] = Map(
    "ag13_weighted_percentile" -> ag13Sql,
    "ag12_map_agg" -> ag12Sql,
    "ag11_registry_aggs" -> ag11Sql,
    "ag10_map_reduce_agg" -> ag10Sql,
    "ag9_numeric_histogram" -> ag9Sql,
    "ag1_minmax_by" -> ag1Sql,
    "ag2_bool_bit" -> ag2Sql,
    "ag3_stats" -> ag3Sql,
    "ag4_approx_bounds" -> ag4Sql,
    "ag5_ordered_agg" -> ag5Sql,
    "ag6_histogram" -> ag6Sql,
    "ag7_regression" -> ag7Sql,
    "ag8_checksum" -> ag8Sql)
}
