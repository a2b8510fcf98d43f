package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.engine.Num._

/** Composite analytics: multi-operator shapes a reference user runs
  * daily — windowed time-series deltas over aggregates, and
  * co-occurrence (market-basket) mining. Each composes operators
  * already covered individually (joins, decimal-exact aggregation,
  * window lag, self-join pair expansion) into one plan.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  // ------------------------------------------- x1 year-over-year
  /** Year-over-year revenue growth per nation: aggregate → window lag
    * over the (tiny) nation×year relation → exact-decimal delta, one
    * IEEE division for the growth rate. Scale: the window runs over
    * |nations|×|years| rows — the big table only feeds the first
    * aggregation. */
  def x1(s: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate revenue per order BEFORE the join chain (an
    // eager-aggregation rewrite Catalyst doesn't do itself): lineitem's
    // ~4 lines/order collapse map-side (lineitem parquet is laid out by
    // order), so the join and the final aggregate see |orders| rows,
    // not |lineitem|. Decimal sums are associative, so sum-of-order-sums
    // is hash-identical to the flat sum.
    // Limb pair, not a widened decimal: the per-order partial sums ride
    // through the join chain as two plain longs and re-aggregate as two
    // primitive long sums — value = hi*10^6 + lo is preserved exactly
    // at both levels, and no BigDecimal is touched until the final
    // 175-row assembly.
    val orl = sumLimbsLong(revenueU(col("l_extendedprice"), col("l_discount")))
    val ordRev = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(orl._1.as("orev_hi"), orl._2.as("orev_lo"))
    val yearly = ordRev
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(limbsToDecimal(sum(col("orev_hi")), sum(col("orev_lo")), 4).as("rev"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"))
    yearly
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .select(col("n_name"), col("yr"),
        col("rev").cast("double").as("revenue"),
        ((col("rev") - col("prev")).cast("double") / col("prev").cast("double"))
          .as("yoy_growth"))
  }

  val x1Sql: String =
    """WITH yearly AS (
      |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem
      |    JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, year(o_orderdate))
      |SELECT n_name, yr, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rev - lag(rev) OVER w AS DOUBLE) / CAST(lag(rev) OVER w AS DOUBLE) AS yoy_growth
      |FROM yearly
      |WINDOW w AS (PARTITION BY n_name ORDER BY yr)""".stripMargin

  // --------------------------------------------- x2 market basket
  /** Part co-occurrence mining: pairs of parts appearing in the same
    * order at least 3 times. Rewritten round 5 from the
    * distinct→self-join shape (two lineitem scans + three shuffles) to
    * per-order set collection + in-order pair expansion: ONE scan, one
    * shuffle on the order key (map-side partial collect_set), pair
    * generation entirely within each order's array, then one
    * partial/final count on (pa, pb). Pair space is still bounded by
    * Σ lines(order)² — an order's line count is bounded (7 in TPC-H),
    * so the per-key array never grows with scale factor, and the
    * heavy-hitter pairs come out of one partial/final count.
    *
    * Measured against the oracle's relational shape (DISTINCT
    * (order, part) self-join + count — 19× faster than this in
    * DuckDB): raced head-to-head at sf0.1 under the r11 bench
    * protocol, collect+explode 1.39 s vs self-join 1.48 s. The
    * comparator's advantage on that shape is its engine, not the
    * plan — in Spark the self-join pays a second lineitem-wide
    * shuffle (distinct) plus a sort-merge join that the in-array
    * pair expansion avoids entirely, so the packed form stays. */
  def x2(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_distinct(sort_array(collect_list(col("l_partkey")))).as("parts"))
      // sorted array → pairs by index slice: element i pairs with every
      // later element, so pa < pb by construction and the inner filter's
      // per-element O(n) comparison scan disappears. The pair is packed
      // into ONE long (partkeys < 2^32) so the wide pair shuffle — whose
      // keys are mostly unique, so partial agg can't shrink it — moves
      // 8-byte keys and hashes a single column.
      .select(explode(expr(
        "flatten(transform(parts, (x, i) -> transform(" +
          "slice(parts, i + 2, size(parts) - i - 1), " +
          "y -> x * 4294967296L + y)))")).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("together"))
      .filter(col("together") >= 3)
      .select(shiftright(col("pk"), 32).as("pa"),
        col("pk").bitwiseAND(lit(4294967295L)).as("pb"), col("together"))
  }

  val x2Sql: String =
    """SELECT a.pa, b.pb, count(*) AS together
      |FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pa FROM lineitem) a
      |JOIN (SELECT DISTINCT l_orderkey AS ok2, l_partkey AS pb FROM lineitem) b
      |  ON a.ok = b.ok2 AND a.pa < b.pb
      |GROUP BY a.pa, b.pb
      |HAVING count(*) >= 3""".stripMargin

  /** x3: conversion-funnel analysis over the event stream — first
    * view → first click at-or-after it → first purchase at-or-after
    * that, per user, rolled up to stage counts and total
    * view-to-purchase latency. Rewritten round 5 from three
    * aggregate-then-join stages (three events scans, ~8 stage
    * round-trips) to ONE scan and one exchange: three chained
    * per-user window minima (each stage's conditional min references
    * the previous stage's output; all three windows share the
    * user_id partitioning, so Spark sorts once and runs the passes
    * back-to-back in one stage), then a per-user collapse that reuses
    * the same partitioning (no extra shuffle) and a single-row final
    * aggregate. WindowExec's spillable row buffer bounds memory per
    * user at scale. Users with no view yield all-null stages and drop
    * out of every count, matching the original v-anchored join shape.
    * Latency sums exact integer microseconds, so the cross-engine
    * hash is stable. */
  def x3(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Graft.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") >= col("v_ts"),
          col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") >= col("c_ts"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("v_ts"), min(col("c_ts")).as("c_ts"),
        min(col("p_ts")).as("p_ts"))
      .agg(
        count(col("v_ts")).as("n_viewed"),
        count(col("c_ts")).as("n_clicked"),
        count(col("p_ts")).as("n_purchased"),
        sum(unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
          .cast("long").as("total_latency_us"))
  }

  val x3Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY e.user_id)
      |SELECT count(v.v_ts) AS n_viewed, count(c.c_ts) AS n_clicked,
      |  count(p.p_ts) AS n_purchased,
      |  CAST(sum(epoch_us(p.p_ts) - epoch_us(v.v_ts)) AS BIGINT) AS total_latency_us
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_yoy_growth" -> x1 _,
    "x2_market_basket" -> x2 _,
    "x3_funnel" -> x3 _)

  val oracle: Map[String, String] = Map(
    "x1_yoy_growth" -> x1Sql,
    "x2_market_basket" -> x2Sql,
    "x3_funnel" -> x3Sql)
}
