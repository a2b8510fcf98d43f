package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.operators.MatchRecognize

/** MATCH_RECOGNIZE fixture queries (reference: grammar
  * `SqlBase.g4:360-399`, `operator/window/matcher/Matcher.java:28`).
  *
  * mr1 detects V-shapes (a falling run followed by a rising run —
  * pattern `D+ U+` with PREV()-style DEFINE predicates) in each user's
  * event-value series. The oracle replays the same semantics
  * relationally: under greedy leftmost matching with AFTER MATCH SKIP
  * PAST LAST ROW, the number of `D+ U+` matches equals the number of
  * D→U direction flips (valleys) — a lag()-based rewrite DuckDB can
  * run, giving the pattern operator a real cross-engine gate. */
object Patterns {

  def mr1(s: SparkSession, dir: String): DataFrame = {
    val ev = Graft.load(s, dir, "events").select(
      col("user_id"), col("event_id"), col("value"))
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("value") < p.getAs[Double]("value")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("value") > p.getAs[Double]("value")
    MatchRecognize(ev, "user_id", "event_id", "D+ U+", Map('D' -> down, 'U' -> up))
      .groupBy(col("part_key").as("user_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  val mr1Sql: String =
    """WITH d AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN value < lag(value) OVER w THEN 'D'
      |         WHEN value > lag(value) OVER w THEN 'U'
      |         ELSE 'F' END AS dir
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |v AS (
      |  SELECT user_id,
      |    CASE WHEN dir = 'U' AND lag(dir) OVER (PARTITION BY user_id ORDER BY event_id) = 'D'
      |         THEN 1 ELSE 0 END AS valley
      |  FROM d)
      |SELECT user_id, CAST(sum(valley) AS BIGINT) AS n_matches
      |FROM v GROUP BY user_id
      |HAVING sum(valley) > 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr1_match_recognize" -> mr1 _)

  val oracle: Map[String, String] = Map(
    "mr1_match_recognize" -> mr1Sql)
}
