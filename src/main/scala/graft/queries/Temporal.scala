package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.operators.Ops

/** Temporal joins over the event stream: the as-of join (each event
  * picks its most recent context row). The oracle runs DuckDB's
  * NATIVE `ASOF LEFT JOIN` against our windowed-union implementation
  * (`operators/Ops.asOfJoin`) — two entirely different algorithms
  * agreeing row-for-row is the strongest cross-engine gate in the
  * suite. */
object Temporal {

  /** ao1: every click joined to the user's most recent purchase
    * at-or-before the click. Right side deduped to one row per
    * (user_id, ts) keeping max event_id — (user_id, ts) is unique in
    * the fixture at sf0.01 but NOT guaranteed at larger SFs, and both
    * engines need the identical tie policy. */
  def ao1(s: SparkSession, dir: String): DataFrame = {
    val ev = Graft.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val dedup = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(dedup)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event"), col("value").as("p_value"),
        col("ts").as("p_ts"))
    Ops.asOfJoin(clicks, purchases, "user_id", "ts",
      Seq("p_event", "p_value", "p_ts"))
  }

  val ao1Sql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, ts, event_id AS p_event, value AS p_value, ts AS p_ts
      |  FROM events WHERE event_type = 'purchase'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
      |SELECT l.event_id, l.user_id, l.ts, r.p_event, r.p_value, r.p_ts
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** rj1: pure theta (band) join — parts priced into hand-authored,
    * non-uniform price tiers via `lo <= p < hi` inequality predicates
    * only (no equi key at all; reference nested-loop join path,
    * `NestedLoopJoinOperator.java`). Spark plans this as a
    * BroadcastNestedLoopJoin with the 4-row tier relation broadcast —
    * the ONLY sound shape for a band join whose probe side scales:
    * the fact table never shuffles, each partition scans the
    * broadcast band list. (A growing band table would instead call
    * for interval partitioning — bucket the fact rows by coarse
    * range, equi-join on the bucket, residual-filter the bounds.) */
  def rj1(s: SparkSession, dir: String): DataFrame = {
    val tiers = s.createDataFrame(Seq(
      ("budget", 0.0, 1200.0),
      ("mid", 1200.0, 1500.0),
      ("premium", 1500.0, 1800.0),
      ("luxury", 1800.0, 10000.0))).toDF("tier", "lo", "hi")
    Graft.load(s, dir, "part")
      .join(broadcast(tiers),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_parts"),
        graft.engine.Num.xsum(col("p_retailprice")).as("tier_value"))
  }

  val rj1Sql: String =
    """SELECT tier, count(*) AS n_parts,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS tier_value
      |FROM part
      |JOIN (VALUES ('budget', 0.0, 1200.0), ('mid', 1200.0, 1500.0),
      |             ('premium', 1500.0, 1800.0), ('luxury', 1800.0, 10000.0))
      |  AS t(tier, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY tier""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ao1_asof_join" -> ao1 _,
    "rj1_band_join" -> rj1 _)

  val oracle: Map[String, String] = Map(
    "ao1_asof_join" -> ao1Sql,
    "rj1_band_join" -> rj1Sql)
}
