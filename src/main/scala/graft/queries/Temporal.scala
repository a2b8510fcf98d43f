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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ao1_asof_join" -> ao1 _)

  val oracle: Map[String, String] = Map(
    "ao1_asof_join" -> ao1Sql)
}
