package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.engine.Num._

/** Window-function suite: ranking, value functions, aggregates over
  * ROWS/RANGE frames, top-N-per-group, and a GROUPS-frame rewrite.
  *
  * Capability match: reference `operator/WindowOperator.java:70` (963
  * LoC window operator), the function inventory under
  * `operator/window/` (RowNumberFunction.java .. NTileFunction.java,
  * FirstValueFunction.java .. LeadFunction.java,
  * AggregateWindowFunction.java), frames in `RowsFraming.java` /
  * `RangeFraming.java` / `GroupsFraming.java`, and the specialized
  * top-N-per-group executors (`operator/TopNRankingOperator.java:1`,
  * `RowNumberOperator.java:1`) — the corpus style follows
  * `testing/trino-testing/.../AbstractTestWindowQueries.java`.
  *
  * Determinism discipline (the oracle hash-matches exact values):
  * every ORDER BY inside a window whose function is order-sensitive
  * (row_number, ntile, lag/lead, nth_value, ROWS frames) is made TOTAL
  * with a unique tie-break key; rank/dense_rank/percent_rank/cume_dist
  * and RANGE frames are tie-insensitive by construction. Sums inside
  * frames use decimal-exact Num.money so partial order never shows.
  *
  * Scale notes (100 TB): a window is one shuffle on partitionBy keys +
  * per-partition sort — same cost shape as the reference's
  * WindowOperator PagesIndex. Every query below partitions by a
  * high-cardinality key (custkey/suppkey/userkey); none uses an
  * unpartitioned global window except through an aggregated
  * distinct-key relation that is already tiny (w10's per-date groups).
  * Top-N-per-group relies on Catalyst's InferWindowGroupLimit so rank
  * filters prune inside the sort instead of materializing full
  * partitions (verified by plan snapshot in the test suite).
  */
object Windows {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  // ------------------------------------------------------- w1 ranking
  /** row_number / rank / dense_rank per customer.
    * Ref: operator/window/RowNumberFunction.java, RankFunction.java. */
  def w1(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byPriceTies = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      // ranks are int32 in Spark but int64 in the oracle engine — widen
      row_number().over(byPrice).cast("long").as("rn"),
      rank().over(byPriceTies).cast("long").as("rnk"),
      dense_rank().over(byPriceTies).cast("long").as("drnk"))
  }

  val w1Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |  rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
      |FROM orders""".stripMargin

  // ------------------------------------------------ w2 ntile/pct/cume
  /** ntile + percent_rank + cume_dist per order priority.
    * Ref: operator/window/NTileFunction.java, PercentRankFunction.java,
    * CumulativeDistributionFunction.java. */
  def w2(s: SparkSession, dir: String): DataFrame = {
    val total = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ties = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(4).over(total).cast("long").as("tile"),
      percent_rank().over(ties).as("pr"),
      cume_dist().over(ties).as("cd"))
  }

  val w2Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4)       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS tile,
      |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pr,
      |  cume_dist()    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
      |FROM orders""".stripMargin

  // ---------------------------------------------------- w3 lag / lead
  /** lag/lead with explicit defaults over each customer's order
    * history. Ref: operator/window/LagFunction.java, LeadFunction.java. */
  def w3(s: SparkSession, dir: String): DataFrame = {
    val hist = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1, -1.0).over(hist).as("prev_price"),
      lead(col("o_totalprice"), 1, -1.0).over(hist).as("next_price"))
  }

  val w3Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice, 1, -1.0)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  lead(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders""".stripMargin

  // ------------------------------------------------- w4 IGNORE NULLS
  /** Value functions with IGNORE NULLS: last non-error measurement
    * strictly before the current event, and lag-ignore-nulls, per user.
    * Ref: IGNORE NULLS handling in operator/window/FirstValueFunction
    * .java / LagFunction.java (ValueWindowFunction SPI). */
  def w4(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val before = seq.rowsBetween(Window.unboundedPreceding, -1)
    val nonError = when(col("event_type") =!= "error", col("value"))
    t(s, dir, "events").select(
      col("user_id"), col("event_id"),
      last(nonError, ignoreNulls = true).over(before).as("prev_ok_value"),
      lag(nonError, 1, null, ignoreNulls = true).over(seq).as("lag_ok_value"))
  }

  val w4Sql: String =
    """SELECT user_id, event_id,
      |  last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ok_value,
      |  lag(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY event_id) AS lag_ok_value
      |FROM events""".stripMargin

  // ------------------------------------------------ w5 running totals
  /** Running (cumulative) decimal-exact sum + running count per
    * customer: ROWS UNBOUNDED PRECEDING .. CURRENT ROW.
    * Ref: operator/window/AggregateWindowFunction.java + RowsFraming. */
  def w5(s: SparkSession, dir: String): DataFrame = {
    val run = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      decSumOver2dp(col("o_totalprice"), run).cast("double").as("run_spend"),
      count(lit(1)).over(run).as("run_orders"))
  }

  val w5Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_orders
      |FROM orders""".stripMargin

  // ------------------------------------------------ w6 RANGE frame
  /** Numeric RANGE frame: how many orders (and how much value) sit
    * within 1000 below the current price, per priority class. RANGE
    * includes peers → tie-insensitive. Ref: RangeFraming.java. */
  def w6(s: SparkSession, dir: String): DataFrame = {
    // Scala Window.rangeBetween only takes Long boundaries; a fractional
    // range offset needs the SQL window form (same Catalyst plan).
    val over = "OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice " +
      "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    t(s, dir, "orders").selectExpr(
      "o_orderkey", "o_orderpriority",
      s"count(*) $over AS band_cnt",
      s"CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) $over AS DOUBLE) AS band_sum")
  }

  val w6Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS band_cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS band_sum
      |FROM orders""".stripMargin

  // -------------------------------------- w7 first/last/nth value fns
  /** first_value / last_value / nth_value over the full partition
    * frame (richest/poorest/3rd-richest customer per nation).
    * Ref: FirstValueFunction.java, LastValueFunction.java,
    * NthValueFunction.java. */
  def w7(s: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer").select(
      col("c_custkey"), col("c_nationkey"),
      first(col("c_name")).over(full).as("richest"),
      last(col("c_name")).over(full).as("poorest"),
      nth_value(col("c_name"), 3).over(full).as("third"))
  }

  val w7Sql: String =
    """SELECT c_custkey, c_nationkey,
      |  first_value(c_name) OVER w AS richest,
      |  last_value(c_name)  OVER w AS poorest,
      |  nth_value(c_name,3) OVER w AS third
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // --------------------------------------------- w8 top-N per group
  /** Top-3 orders per customer via rank filter — Catalyst rewrites the
    * row_number + predicate into WindowGroupLimit so each partition
    * keeps a bounded heap instead of a full sort (the reference's
    * specialized `operator/TopNRankingOperator.java:1` /
    * `GroupedTopNRowNumberBuilder.java`). */
  def w8(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ops.topNPerGroup(
        t(s, dir, "orders"), 3,
        partition = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))

  val w8Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) ranked
      |WHERE rn <= 3""".stripMargin

  // ------------------------------------------- w9 moving aggregates
  /** Moving sum/min/max/count/avg over a sliding ROWS frame (3
    * preceding .. current) per supplier shipment history. The moving
    * avg divides a decimal-exact sum by the frame count so both
    * engines perform one identical IEEE division. */
  def w9(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the fixture at larger
    // SFs — the price column joins the tie-break so the order is total
    // over every column the frame reads
    val slide = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .rowsBetween(-3, Window.currentRow)
    t(s, dir, "lineitem").select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      decSumOver2dp(col("l_extendedprice"), slide).cast("double").as("mov_sum"),
      min(col("l_extendedprice")).over(slide).as("mov_min"),
      max(col("l_extendedprice")).over(slide).as("mov_max"),
      count(lit(1)).over(slide).as("mov_cnt"),
      (decSumOver2dp(col("l_extendedprice"), slide).cast("double") /
        count(lit(1)).over(slide)).as("mov_avg"))
  }

  val w9Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS mov_sum,
      |  min(l_extendedprice) OVER w AS mov_min,
      |  max(l_extendedprice) OVER w AS mov_max,
      |  count(*) OVER w AS mov_cnt,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w AS DOUBLE) / count(*) OVER w AS mov_avg
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

  // ------------------------------------------ w10 GROUPS frame rewrite
  /** GROUPS frame emulation (SURVEY §7.3 hard item (b)): `sum(x) OVER
    * (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)` has no
    * Spark equivalent (and DuckDB 1.0 lacks it too), so both sides use
    * the canonical rewrite: aggregate per distinct key, window over the
    * (tiny) distinct-key relation with a ROWS frame, join back. Ref:
    * `operator/window/GroupsFraming.java`. At 100 TB the distinct-key
    * relation is |dates| ≈ thousands → broadcast join back, no extra
    * big-table shuffle beyond the per-key aggregation. */
  def w10(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val perDay = orders.groupBy(col("o_orderdate").as("d"))
      .agg(sumLimbsLong(unscaled2dp(col("o_totalprice")))._1.as("day_hi"),
        sumLimbsLong(unscaled2dp(col("o_totalprice")))._2.as("day_lo"))
    val groupsFrame = Window.orderBy(col("d")).rowsBetween(-1, Window.currentRow)
    val withPrev = perDay.select(
      col("d"),
      limbsToDecimal(sum(col("day_hi")).over(groupsFrame),
        sum(col("day_lo")).over(groupsFrame), 2).cast("double").as("grp_sum"))
    orders.join(broadcast(withPrev), col("o_orderdate") === col("d"))
      .select(col("o_orderkey"), col("grp_sum"))
  }

  val w10Sql: String =
    """WITH g AS (
      |  SELECT o_orderdate AS d, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS day_sum
      |  FROM orders GROUP BY o_orderdate),
      |g2 AS (
      |  SELECT d, CAST(day_sum + COALESCE(lag(day_sum) OVER (ORDER BY d), 0) AS DOUBLE) AS grp_sum
      |  FROM g)
      |SELECT o_orderkey, grp_sum
      |FROM orders JOIN g2 ON o_orderdate = d""".stripMargin

  // -------------------------------------- w11 frame EXCLUDE rewrite
  /** SQL:2016 window frame exclusion (reference grammar `SqlBase.g4`
    * frameExtent EXCLUDE CURRENT ROW / GROUP / TIES; Trino implements
    * all three) — Spark has no EXCLUDE clause, so each mode is
    * composed from inclusive frames with exact decimal arithmetic:
    * EXCLUDE CURRENT ROW = running sum − current value (NULL when the
    * excluded frame is empty, per the standard); EXCLUDE GROUP =
    * partition total − peer-group sum (peers = equal ORDER BY value),
    * NULL when every row is a peer; EXCLUDE TIES = total − peers +
    * current (never empty). The oracle runs DuckDB's NATIVE EXCLUDE
    * syntax over the identical decimal sums, so the rewrite is proven
    * equivalent to the real SQL:2016 semantics, not to itself. */
  def w11(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val all = Window.partitionBy(col("user_id"))
    val peers = Window.partitionBy(col("user_id"), money(col("value")))
    val v = money(col("value"))
    val runSum = sum(v).over(run)
    val runCnt = count(lit(1)).over(run)
    val total = sum(v).over(all)
    val totalCnt = count(lit(1)).over(all)
    val peerSum = sum(v).over(peers)
    val peerCnt = count(lit(1)).over(peers)
    ev.select(col("user_id"), col("event_id"),
      when(runCnt === 1, lit(null))
        .otherwise((runSum - v).cast("double")).as("ex_current"),
      when(totalCnt === peerCnt, lit(null))
        .otherwise((total - peerSum).cast("double")).as("ex_group"),
      (total - peerSum + v).cast("double").as("ex_ties"))
  }

  val w11Sql: String =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)
      |    AS DOUBLE) AS ex_current,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(value AS DECIMAL(12,2))
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP)
      |    AS DOUBLE) AS ex_group,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(value AS DECIMAL(12,2))
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES)
      |    AS DOUBLE) AS ex_ties
      |FROM events""".stripMargin

  // ------------------------------------------------------------- exports
  // ------------------------ w12 dynamic frame offsets (operator path)
  /** w12: per-row ROWS frame offsets via the SPILLABLE operator
    * ([[graft.operators.DynamicFrames.rowsFrameAgg]]) — the 100-TB
    * path for non-constant frame bounds, matching the reference's
    * O(frame)-per-row `operator/window/RowsFraming.java` over a
    * spillable buffer (the SQL front-end's dx30 lowering buffers the
    * partition as one unspillable array and is size-guarded; this
    * operator pages to disk instead). Asymmetric per-row offsets
    * (event_id % 5 back, event_id % 3 forward) exercise clamping at
    * both partition edges; the oracle reproduces the frames
    * relationally via a positional self-join on an independent
    * engine. */
  def w12(s: SparkSession, dir: String): DataFrame = {
    val ev = Graft.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        (col("event_id") % 5).as("lo"), (col("event_id") % 3).as("hi"))
    graft.operators.DynamicFrames.rowsFrameAgg(
      ev, Seq("user_id"), Seq("event_id"), "lo", "hi", "event_id",
      "sum", "s")
      .select(col("user_id"), col("event_id"), col("s").cast("long").as("s"))
  }

  val w12Sql: String =
    """WITH r AS (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events)
      |SELECT a.user_id, a.event_id, CAST(sum(b.event_id) AS BIGINT) AS s
      |FROM r a JOIN r b ON a.user_id = b.user_id
      |  AND b.rn BETWEEN a.rn - (a.event_id % 5) AND a.rn + (a.event_id % 3)
      |GROUP BY a.user_id, a.event_id""".stripMargin

  // ---------------- w13/w14 dynamic GROUPS / RANGE frames (operator)
  /** w13: per-row GROUPS frame offsets via the spillable operator
    * ([[graft.operators.DynamicFrames.groupsFrameAgg]]) — frames
    * count PEER GROUPS on a deliberately coarse sort key
    * (event_id DIV 16, so groups of ~16 rows tie) with per-row
    * offsets; the oracle reproduces the group frames relationally
    * via a dense_rank self-join on an independent engine. */
  def w13(s: SparkSession, dir: String): DataFrame = {
    val ev = Graft.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        (col("event_id") / lit(16)).cast("long").as("gk"),
        (col("event_id") % 3).as("lo"), (col("event_id") % 2).as("hi"))
    graft.operators.DynamicFrames.groupsFrameAgg(
      ev, Seq("user_id"), Seq("gk"), "lo", "hi", "event_id", "sum", "s")
      .select(col("user_id"), col("event_id"), col("s").cast("long").as("s"))
  }

  val w13Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, event_id // 16 AS gk,
      |    dense_rank() OVER (PARTITION BY user_id ORDER BY event_id // 16) AS gr
      |  FROM events)
      |SELECT a.user_id, a.event_id, CAST(sum(b.event_id) AS BIGINT) AS s
      |FROM g a JOIN g b ON a.user_id = b.user_id
      |  AND b.gr BETWEEN a.gr - (a.event_id % 3) AND a.gr + (a.event_id % 2)
      |GROUP BY a.user_id, a.event_id""".stripMargin

  /** w14: per-row RANGE frame offsets via the spillable operator
    * ([[graft.operators.DynamicFrames.rangeFrameAgg]]) — the frame is
    * a per-row numeric band [k-lo, k+hi] on the sort-key axis,
    * located by binary search; the oracle is the equivalent band
    * self-join. */
  def w14(s: SparkSession, dir: String): DataFrame = {
    val ev = Graft.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        (col("event_id") % 997).cast("double").as("k"),
        (col("event_id") % 7).cast("double").as("lo"),
        (col("event_id") % 5).cast("double").as("hi"))
    graft.operators.DynamicFrames.rangeFrameAgg(
      ev, Seq("user_id"), "k", "lo", "hi", "event_id", "sum", "s")
      .select(col("user_id"), col("event_id"), col("s").cast("long").as("s"))
  }

  val w14Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(event_id % 997 AS DOUBLE) AS k
      |  FROM events)
      |SELECT a.user_id, a.event_id, CAST(sum(b.event_id) AS BIGINT) AS s
      |FROM g a JOIN g b ON a.user_id = b.user_id
      |  AND b.k BETWEEN a.k - (a.event_id % 7) AND a.k + (a.event_id % 5)
      |GROUP BY a.user_id, a.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_dynamic_groups_operator" -> w13 _,
    "w14_dynamic_range_operator" -> w14 _,
    "w12_dynamic_frame_operator" -> w12 _,
    "w11_frame_exclude" -> w11 _,
    "w1_ranking" -> w1 _,
    "w2_ntile_pct" -> w2 _,
    "w3_lag_lead" -> w3 _,
    "w4_ignore_nulls" -> w4 _,
    "w5_running_sum" -> w5 _,
    "w6_range_frame" -> w6 _,
    "w7_value_fns" -> w7 _,
    "w8_topn_per_group" -> w8 _,
    "w9_moving_agg" -> w9 _,
    "w10_groups_frame" -> w10 _)

  val oracle: Map[String, String] = Map(
    "w13_dynamic_groups_operator" -> w13Sql,
    "w14_dynamic_range_operator" -> w14Sql,
    "w12_dynamic_frame_operator" -> w12Sql,
    "w11_frame_exclude" -> w11Sql,
    "w1_ranking" -> w1Sql,
    "w2_ntile_pct" -> w2Sql,
    "w3_lag_lead" -> w3Sql,
    "w4_ignore_nulls" -> w4Sql,
    "w5_running_sum" -> w5Sql,
    "w6_range_frame" -> w6Sql,
    "w7_value_fns" -> w7Sql,
    "w8_topn_per_group" -> w8Sql,
    "w9_moving_agg" -> w9Sql,
    "w10_groups_frame" -> w10Sql)
}
