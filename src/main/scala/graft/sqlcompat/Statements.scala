package graft.sqlcompat

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statement-level front-end (reference grammar `SqlBase.g4:166-173`
  * SET SESSION / RESET SESSION): session properties map onto Spark
  * confs, everything else routes through [[Dialect.translate]] +
  * `spark.sql`. The mapped property set covers the session knobs with
  * a real Spark analog; spelled-out `spark.*` keys pass through
  * verbatim; anything else fails loudly (the reference errors on
  * unknown session properties too — silent acceptance would fake a
  * behavior change that never happens). */
object Statements {

  /** reference session property → (spark conf, value translation) */
  private val mapped: Map[String, (String, String => String)] = Map(
    // DetermineJoinDistributionType's session override: BROADCAST
    // forces replicated joins (no size cap), PARTITIONED forbids them,
    // AUTOMATIC restores the cost-based default (Spark: AQE + size
    // threshold decide).
    "join_distribution_type" -> (("spark.sql.autoBroadcastJoinThreshold", {
      case v if v.equalsIgnoreCase("PARTITIONED") => "-1"
      case v if v.equalsIgnoreCase("BROADCAST") => (512L * 1024 * 1024).toString
      case _ => "10485760" // AUTOMATIC → Spark default 10 MB
    })),
    // per-query parallelism knob → shuffle partition count
    "task_concurrency" -> (("spark.sql.shuffle.partitions", identity[String])),
    // required-workers analog: minimum executors before running
    "query_max_execution_time" ->
      (("spark.sql.broadcastTimeout", v => v.replaceAll("[^0-9]", ""))))

  private val setRe =
    "(?is)^\\s*SET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*=\\s*(.+?)\\s*$".r
  private val resetRe =
    "(?is)^\\s*RESET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*$".r

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** Execute one statement. SET/RESET SESSION return an empty frame
    * (the reference returns a result-less OK); queries return rows. */
  def execute(s: SparkSession, sql: String): DataFrame = sql match {
    case setRe(key, value) =>
      val v = unquote(value)
      mapped.get(key.toLowerCase) match {
        case Some((conf, xlate)) => s.conf.set(conf, xlate(v))
        case None if key.startsWith("spark.") => s.conf.set(key, v)
        case None => throw new IllegalArgumentException(
          s"unknown session property '$key' (mapped: ${mapped.keys.toSeq.sorted.mkString(", ")}; spark.* keys pass through)")
      }
      s.emptyDataFrame
    case resetRe(key) =>
      mapped.get(key.toLowerCase) match {
        case Some((conf, _)) => s.conf.unset(conf)
        case None if key.startsWith("spark.") => s.conf.unset(key)
        case None => throw new IllegalArgumentException(
          s"unknown session property '$key'")
      }
      s.emptyDataFrame
    case other => s.sql(Dialect.translate(other))
  }
}
