package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Graft, Num}
import graft.engine.Num._

/** TPC-H-shaped relational suite, adapted to the driver's simplified
  * star schema (FIXTURES.md: no partsupp; lineitem lacks
  * shipmode/commitdate/receiptdate; customer lacks phone; nations are
  * NATION_0..24). Exercises the reference's §2 operator inventory:
  * hash aggregation partial/final, hash joins (broadcast + shuffled),
  * semi/anti joins, correlated + scalar subqueries, top-N, HAVING,
  * conditional aggregation, left joins.
  *
  * Query shapes follow the public TPC-H specification (q1..q22);
  * operator coverage mirrors reference
  * `core/trino-main/.../operator/` (HashAggregationOperator.java:49,
  * LookupJoinOperator.java:1, HashSemiJoinOperator.java:1,
  * TopNOperator.java:1, EnforceSingleRowOperator.java:1).
  *
  * Scale notes (100 TB): every query below is a pure declarative plan —
  * Catalyst pushes filters to the parquet scan and splits every
  * aggregate into partial/final. No collect(), no driver-side loops, no
  * single-partition bottlenecks. Explicit `broadcast()` hints appear
  * ONLY on relations whose size is bounded regardless of scale factor:
  * `region` (5 rows) / `nation` (25 rows) and single-row scalar
  * aggregates. customer/supplier/part grow linearly with SF, so their
  * join strategy is left to AQE's runtime size check
  * (`autoBroadcastJoinThreshold`) — a forced broadcast there would OOM
  * at cluster scale instead of degrading to a shuffle join.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  private def ts(d: String): Column = to_timestamp(lit(d))

  // ---------------------------------------------------------------- q1
  /** Pricing summary: full-scan aggregate with 8 aggregates.
    * Ref: the hand-benchmarked query in
    * `testing/trino-benchmark/.../HandTpchQuery1.java`. */
  def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        xsum(col("l_quantity")).as("sum_qty"),
        xsum(col("l_extendedprice")).as("sum_base_price"),
        decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("sum_disc_price"),
        // Coarsened to (28,2) before the DOUBLE boundary, same as dc2:
        // per-group charge sums pass 2^52 in scale-6 units at sf0.1,
        // where a direct double cast would lean on both engines'
        // decimal->double rounding agreeing bit-for-bit.
        round(decSumLong(chargeU(col("l_extendedprice"), col("l_discount"), col("l_tax")), 6)
          .cast(DecimalType(32, 6)), 2)
          .cast(DecimalType(28, 2)).cast("double").as("sum_charge"),
        xavg(col("l_quantity")).as("avg_qty"),
        xavg(col("l_extendedprice")).as("avg_price"),
        (decSumLong(unscaled2dp(col("l_discount")), 2).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DECIMAL(32,6)), 2) AS DECIMAL(28,2)) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2 (adapted: no partsupp → top-priced orders per segment)
  /** Top-N with deterministic tie-break (TakeOrderedAndProject). */
  def q2(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q2Sql: String =
    """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Shipping priority: 3-way join + agg + top-N on computed measure. */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-03-15"))
    val line = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-03-15"))
    cust
      .join(orders, cust("c_custkey") === orders("o_custkey"))
      .join(line, orders("o_orderkey") === line("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4 (adapted: EXISTS predicate on quantity, not commitdate)
  /** Order priority checking: EXISTS → left-semi join. */
  def q4(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
    val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    orders.join(bigLines, orders("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Local supplier volume: 6-way join, dims broadcast. */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val line = t(s, dir, "lineitem")
    val supp = t(s, dir, "supplier")
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    cust.join(orders, col("c_custkey") === col("o_custkey"))
      .join(line, col("o_orderkey") === col("l_orderkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Forecasting revenue change: scan + tight filter + global agg.
    * Ref: `testing/trino-benchmark/.../HandTpchQuery6.java`. */
  def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(decSumLong(unscaled2dp(col("l_extendedprice")) * unscaled2dp(col("l_discount")), 4).cast("double").as("revenue"))

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Volume shipping between two nations: self-joined dim, year extract. */
  def q7(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation").select(
      col("n_nationkey").as("supp_nkey"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").select(
      col("n_nationkey").as("cust_nkey"), col("n_name").as("cust_nation"))
    val line = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(ts("1995-01-01"), ts("1996-12-31")))
    t(s, dir, "supplier")
      .join(line, col("s_suppkey") === col("l_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("supp_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cust_nkey"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("revenue"))

  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      |GROUP BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q8 (adapted: market share of NATION_5 suppliers in ASIA)
  def q8(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val nCust = t(s, dir, "nation").select(
      col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey"))
    val nSupp = t(s, dir, "nation").select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    t(s, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .join(broadcast(region), col("cn_rkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_5", vol)).cast("double") /
            sum(vol).cast("double")).as("mkt_share"))
  }

  val q8Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)))
      |       FILTER (WHERE n2.n_name = 'NATION_5') AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS mkt_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q9 (adapted: profit proxy = revenue - 0.5*retail*qty)
  /** Amount in UNSCALED LONG space (scale 4): revenueU is price-cents ×
    * (100 − discount-cents); the cost side is retail-cents × qty-cents
    * / 2, exact because qty-cents is a multiple of 100 (= ×10⁴ of
    * retail·0.5·qty). Same exact value as the decimal formulation the
    * oracle sums, but the per-row hot path is three long multiplies
    * instead of Decimal(38) object arithmetic — r15's q9 carried the
    * suite's worst floor-adjusted excess (+0.18 s at sf0.1, 600 k rows
    * through the multiply) purely on BigDecimal row work; the joins
    * and aggregation shape were already right. decSumLong capacity at
    * per-row |u| ≤ ~1e9 is ~9e12 rows per group — 100 TB-safe. */
  def q9(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_name").like("%red%"))
    val amountU4 = revenueU(col("l_extendedprice"), col("l_discount")) -
      // halving by shift: the product is even (qty-cents is ×100) and
      // non-negative, and Column./ would be DOUBLE division
      shiftright(unscaled2dp(col("p_retailprice")) * unscaled2dp(col("l_quantity")), 1)
    t(s, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(decSumLong(amountU4, 4).cast("double").as("sum_profit"))
  }

  val q9Sql: String =
    """SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
      |         - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Returned item reporting: top 20 customers by lost revenue. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-10-01") && col("o_orderdate") < ts("1997-01-01"))
    val line = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    t(s, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(line, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q11 (adapted: supplier value share w/ scalar subquery)
  def q11(s: SparkSession, dir: String): DataFrame = {
    // r20b: ONE lineitem scan and ONE lineage. The old shape computed
    // the HAVING threshold with a second full lineitem aggregate (the
    // final-plan audit showed the branches do NOT share their exchange
    // at runtime, so lineitem was scanned and aggregated twice). The
    // threshold is the exact sum of the per-supplier exact decimal
    // sums — decimal addition is associative, so a window total over
    // the supplier-bounded census reproduces the whole-table decSumLong
    // bit-for-bit. The single-partition window pass runs over |supplier|
    // rows, never the fact table.
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    t(s, dir, "lineitem").groupBy(col("l_suppkey"))
      .agg(decSumLong(unscaled2dp(col("l_extendedprice")), 2).as("value_dec"))
      .withColumn("threshold", sum(col("value_dec")).over(w0).cast("double") * 0.001)
      .filter(col("value_dec").cast("double") > col("threshold"))
      .select(col("l_suppkey"), col("value_dec").cast("double").as("value"))
  }

  val q11Sql: String =
    """SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
      |FROM lineitem GROUP BY l_suppkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 0.001 FROM lineitem)""".stripMargin

  // ---------------------------------------------------------------- q12 (adapted: linestatus in place of shipmode)
  /** Conditional aggregation (CASE inside SUM). */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val line = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
    t(s, dir, "orders")
      .join(line, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate"))
      .groupBy(col("l_linestatus"))
      .agg(
        lsum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
        lsum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate >= o_orderdate
      |GROUP BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Customer order-count distribution: LEFT OUTER join + nested agg. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Promotion effect: conditional share of revenue. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val line = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    line.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", vol)).cast("double") /
        sum(vol).cast("double")).as("promo_revenue"))
  }

  val q14Sql: String =
    """SELECT 100.0 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)))
      |    FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Top supplier: derived view + scalar-subquery max (EnforceSingleRow). */
  def q15(s: SparkSession, dir: String): DataFrame = {
    // r20b: the revenue census fed BOTH the max scalar and the join (a
    // diamond), and the final-plan audit showed the branches do not
    // share their exchange at runtime — lineitem was scanned and
    // aggregated twice. The max is now a window total over the
    // supplier-bounded census (one lineage, one lineitem scan); the
    // single-partition window pass runs over |supplier| rows, never
    // the fact table. Same census values, same max, same equality
    // filter — results identical.
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("total_revenue"))
      .withColumn("max_revenue", max(col("total_revenue")).over(w0))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .filter(col("total_revenue") === col("max_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin

  // ---------------------------------------------------------------- q16 (adapted: distinct suppliers per brand/size via lineitem)
  def q16(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    t(s, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Small-quantity-order revenue: correlated scalar subquery → join on
    * pre-aggregated per-part averages (the decorrelation Catalyst and the
    * reference's TransformCorrelatedScalarSubquery both perform).
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    // r20b: ONE lineitem scan instead of two. The old shape built a
    // per-part average census over ALL of lineitem and joined it back
    // to a second lineitem pass. But the part-filter join keeps EVERY
    // line of a surviving part (it only prunes parts), so the per-part
    // average over the joined rows equals the census average for those
    // parts — computed here as window aggregates over the pruned join
    // output, with the identical exact arithmetic (limb sums inside the
    // window; then the same double division and 0.2 factor). The census
    // aggregate over the unfiltered table, its exchange, and the join
    // back all disappear; the one window exchange carries only the
    // brand's lines.
    val line = t(s, dir, "lineitem")
    val part = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    line.join(part, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        graft.engine.Num.decSumOver2dp(col("l_quantity"), w).cast("double") /
          count(col("l_quantity")).over(w) * 0.2)
      .filter(col("l_quantity") < col("avg_qty"))
      .agg((decSumLong(unscaled2dp(col("l_extendedprice")), 2).cast("double") / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < (
      |    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) * 0.2
      |    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Large volume customers: IN-subquery over HAVING agg. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    // ONE lineitem pass (r20): the HAVING measure and the output
    // sum_qty are both per-ORDER aggregates (every extra group key —
    // customer name, order date, total price — is functionally
    // determined by the order key), so one per-order aggregate serves
    // the filter AND the output. The r19 shape scanned lineitem twice
    // (census + main join), shuffled it twice, semi-joined the big
    // orders back, and re-aggregated after the join — all of that
    // collapses into a filtered census joined to orders + customer,
    // with a plain projection on top.
    val perOrder = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(decSumLong(unscaled2dp(col("l_quantity")), 2).as("total_qty"),
        xsum(col("l_quantity")).as("sum_qty"))
      .filter(col("total_qty") > 200)
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Discounted revenue: disjunctive join predicates. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val line = t(s, dir, "lineitem")
    line.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
      .agg(decSumLong(revenueU(col("l_extendedprice"), col("l_discount")), 4).cast("double").as("revenue"))
  }

  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------- q20 (adapted: semi + anti join combination)
  def q20(s: SparkSession, dir: String): DataFrame = {
    val line96 = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
    val returned = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 50)
    val supp = t(s, dir, "supplier")
    supp
      .join(line96, supp("s_suppkey") === line96("l_suppkey"), "left_semi")
      .join(returned, supp("s_suppkey") === returned("l_suppkey"), "left_anti")
      .select(col("s_name"), col("s_acctbal"))
  }

  val q20Sql: String =
    """SELECT s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
      |  AND s_suppkey NOT IN (
      |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 50)""".stripMargin

  // ---------------------------------------------------------------- q21 (adapted: multi-line orders, EXISTS + NOT EXISTS w/ non-equi)
  def q21(s: SparkSession, dir: String): DataFrame = {
    // The EXISTS / NOT EXISTS pair is decided per (order, supplier), so
    // instead of two more passes over lineitem (semi + anti self-joins —
    // three scans and three shuffles of the big table), aggregate a
    // per-order supplier census ONCE and join it back: EXISTS(other
    // supplier) ⇔ n_supp >= 2; NOT EXISTS(other supplier with R) ⇔ the
    // order's R-suppliers are none or exactly l1's. At scale this ships
    // one narrow (orderkey, 3 cols) relation instead of re-shuffling
    // lineitem twice; the (orderkey, suppkey) pre-level collapses
    // duplicate lines map-side before the wide rollup.
    // r20: the probe side no longer re-scans lineitem either — the
    // census carries n_lines (per-line multiplicity), so numwait =
    // SUM(n_lines) over qualifying (order, supplier) census rows,
    // and the per-order stats (n_supp / nr_supp / r_supp) come from
    // WINDOW aggregates over the SAME census relation instead of a
    // second aggregate + self-join. Lineitem is read ONCE by
    // construction (no diamond to deduplicate); the only extra cost
    // is re-hashing the narrow |order×supplier| census by order for
    // the window pass.
    // r20b: ONE lineitem exchange instead of two. Hash-partitioning by
    // l_orderkey alone satisfies the clustering required by BOTH the
    // (ok, sk) aggregate (subset rule: equal (ok, sk) implies equal ok)
    // and the per-order window, so the census aggregate and the window
    // pass share the same exchange instead of re-shuffling the census
    // by ok. The projection before the exchange keeps it to the three
    // columns the census needs (guide: project before the exchange).
    // Bytes per row are the raw line (the map-side partial collapse is
    // lost), but (ok, sk) is nearly distinct per line in this schema so
    // the partials barely collapsed anyway — raced interleaved at
    // sf0.1: 1.288 s (two exchanges) vs 1.039 s (this shape), results
    // identical. repartition() carries no partition count, so AQE still
    // sizes the exchange from the data.
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .repartition(col("l_orderkey"))
    val perSupp = li
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(count(lit(1)).as("n_lines"),
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ok"))
    val census = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("nr_supp", sum(col("has_r")).over(w))
      .withColumn("r_supp", max(when(col("has_r") === 1, col("sk"))).over(w))
    val orders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    census
      .filter(col("n_supp") >= 2 &&
        (col("nr_supp") === 0 ||
          (col("nr_supp") === 1 && col("r_supp") === col("sk"))))
      .join(orders, col("o_orderkey") === col("ok"))
      .join(t(s, dir, "supplier"), col("s_suppkey") === col("sk"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q22 (adapted: nationkey buckets, no phone column)
  def q22(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((decSumLong(unscaled2dp(col("c_acctbal")), 2).cast("double") / count(col("c_acctbal"))).as("avg_bal"))
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 7).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), xsum(col("c_acctbal")).as("totacctbal"))
  }

  val q22Sql: String =
    """SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- exports
  // ------------------------- srt1/srt2 distributed full sort
  /** The reference's distributed-sort benchmark surface
    * (`testing/trino-benchto-benchmarks/.../distributed_sort.yaml:8-15`,
    * `sort_query_1_col.sql` / `sort_query_6_cols.sql`, session flag
    * `SystemSessionProperties.java:114` distributed_sort): a FULL sort
    * of lineitem by one column and by six. Spark plans this as the
    * reference's distributed mode does by default — sample → range
    * partition → per-partition sort, no single-node merge — asserted
    * in SinksSpec (RangePartitioning exchange + global Sort, and the
    * collected order itself at the smoke SF). The oracle gate checks
    * CONTENT (the driver's compare is unordered by design); the
    * ordering property is what the spec pins, and the bench number is
    * the sort's throughput. */
  def srt1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))

  val srt1Sql: String =
    """SELECT l_extendedprice, l_orderkey, l_linenumber
      |FROM lineitem
      |ORDER BY l_extendedprice, l_orderkey, l_linenumber""".stripMargin

  def srt2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))

  val srt2Sql: String =
    """SELECT l_returnflag, l_linestatus, l_shipdate, l_quantity,
      |  l_extendedprice, l_orderkey, l_linenumber
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, l_shipdate, l_quantity,
      |  l_extendedprice, l_orderkey, l_linenumber""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "srt1_sort_1col" -> srt1 _,
    "srt2_sort_6col" -> srt2 _,
    "q1_pricing_summary" -> q1 _,
    "q2_top_orders" -> q2 _,
    "q3_shipping_priority" -> q3 _,
    "q4_order_priority" -> q4 _,
    "q5_local_supplier" -> q5 _,
    "q6_forecast_revenue" -> q6 _,
    "q7_volume_shipping" -> q7 _,
    "q8_market_share" -> q8 _,
    "q9_profit" -> q9 _,
    "q10_returned_items" -> q10 _,
    "q11_supplier_value" -> q11 _,
    "q12_priority_class" -> q12 _,
    "q13_cust_distribution" -> q13 _,
    "q14_promo_effect" -> q14 _,
    "q15_top_supplier" -> q15 _,
    "q16_supplier_cnt" -> q16 _,
    "q17_small_qty" -> q17 _,
    "q18_large_orders" -> q18 _,
    "q19_disjunctive" -> q19 _,
    "q20_semi_anti" -> q20 _,
    "q21_waiting_supplier" -> q21 _,
    "q22_acctbal_buckets" -> q22 _)

  val oracle: Map[String, String] = Map(
    "srt1_sort_1col" -> srt1Sql,
    "srt2_sort_6col" -> srt2Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_top_orders" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_order_priority" -> q4Sql,
    "q5_local_supplier" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q9_profit" -> q9Sql,
    "q10_returned_items" -> q10Sql,
    "q11_supplier_value" -> q11Sql,
    "q12_priority_class" -> q12Sql,
    "q13_cust_distribution" -> q13Sql,
    "q14_promo_effect" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q17_small_qty" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q20_semi_anti" -> q20Sql,
    "q21_waiting_supplier" -> q21Sql,
    "q22_acctbal_buckets" -> q22Sql)
}
