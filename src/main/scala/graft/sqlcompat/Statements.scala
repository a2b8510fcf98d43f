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
  private val prepareRe =
    "(?is)^\\s*PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+(.+)$".r
  private val executeRe =
    "(?is)^\\s*EXECUTE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*(?:USING\\s+(.+))?$".r
  private val deallocRe =
    "(?is)^\\s*DEALLOCATE\\s+PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r

  private def preparedKey(name: String) = s"graft.prepared.$name"

  /** Substitute `?` positional parameters (outside string literals)
    * with the USING expressions, each parenthesized. Textual binding —
    * one documented divergence from the reference: binding happens
    * BEFORE analysis, so a query the reference rejects for using the
    * same parameter in SELECT and GROUP BY positions analyzes fine
    * here once the values are equal. Count mismatches fail loudly in
    * both directions. */
  private def bindParams(sql: String, values: Seq[String]): String = {
    val out = new StringBuilder
    var inStr = false
    var i = 0
    var used = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; out += c }
      else if (c == '?' && !inStr) {
        require(used < values.length,
          s"No value provided for parameter ${used + 1}")
        require(!values(used).contains("?"),
          "No value provided for parameter (a USING value may not itself be '?')")
        out ++= s"(${values(used)})"
        used += 1
      } else out += c
      i += 1
    }
    require(used == values.length,
      s"too many USING values: query has $used parameter(s), got ${values.length}")
    out.toString
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** Execute one statement. SET/RESET SESSION, PREPARE and DEALLOCATE
    * return an empty frame (the reference returns a result-less OK);
    * EXECUTE and queries return rows. Prepared statements (grammar
    * `SqlBase.g4` PREPARE/EXECUTE/DEALLOCATE; the reference binds them
    * as session state) live in the session conf — per-session by
    * construction, no global registry. */
  def execute(s: SparkSession, sql: String): DataFrame = sql match {
    case prepareRe(name, body) =>
      s.conf.set(preparedKey(name), body.trim)
      s.emptyDataFrame
    case deallocRe(name) =>
      require(s.conf.getOption(preparedKey(name)).isDefined,
        s"Prepared statement not found: $name")
      s.conf.unset(preparedKey(name))
      s.emptyDataFrame
    case executeRe(name, usingOrNull) =>
      val body = s.conf.getOption(preparedKey(name)).getOrElse(
        throw new IllegalArgumentException(s"Prepared statement not found: $name"))
      val values = Option(usingOrNull)
        .map(u => MatchRecognizeSql.splitTopLevel(u, ',').map(_.trim))
        .getOrElse(Seq.empty)
      execute(s, bindParams(body, values))
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
    // SHOW SESSION (grammar SqlBase.g4 showSession): the mapped
    // property inventory with each property's CURRENT backing value.
    case sql0 if "(?is)^\\s*SHOW\\s+SESSION\\s*$".r.findFirstIn(sql0).isDefined =>
      import s.implicits._
      mapped.toSeq.sortBy(_._1).map { case (name, (conf, _)) =>
        (name, s.conf.getOption(conf).getOrElse(""), conf)
      }.toDF("name", "value", "spark_conf")
    // SHOW SCHEMAS [FROM cat] — Spark spells it SHOW NAMESPACES
    case sql0 if "(?is)^\\s*SHOW\\s+SCHEMAS\\b".r.findFirstIn(sql0).isDefined =>
      s.sql(sql0.replaceAll("(?i)\\bSHOW\\s+SCHEMAS\\b", "SHOW NAMESPACES"))
    // SHOW STATS FOR t (grammar SqlBase.g4:156-157): the reference's
    // stats surface, served from Spark's ANALYZE'd catalog statistics
    // (DESCRIBE EXTENDED under the hood — run `ANALYZE TABLE t COMPUTE
    // STATISTICS FOR ALL COLUMNS` first, the reference's connectors
    // collect on write). Output shape mirrors the reference: one row
    // per column plus a summary row carrying row_count.
    case showStatsRe(tbl) => showStats(s, tbl)
    case other => s.sql(Dialect.translate(other))
  }

  private val showStatsRe =
    "(?is)^\\s*SHOW\\s+STATS\\s+FOR\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*$".r

  /** SHOW STATS output: (column_name, data_size, distinct_values_count,
    * nulls_fraction, row_count, low_value, high_value) — the
    * reference's `ShowStatsRewrite.java` column set. Absent statistics
    * surface as NULL, never as fabricated values. */
  private def showStats(s: SparkSession, tbl: String): DataFrame = {
    import s.implicits._
    val detail = s.sql(s"DESCRIBE EXTENDED $tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val rowCount: Option[Long] = detail.get("Statistics")
      .flatMap(v => "(\\d+)\\s+rows".r.findFirstMatchIn(v))
      .map(_.group(1).toLong)
    def opt(m: Map[String, String], k: String): Option[String] =
      m.get(k).filter(v => v != null && v != "NULL" && v.nonEmpty)
    val colRows = s.table(tbl).schema.fields.toSeq.map { f =>
      val cs = s.sql(s"DESCRIBE EXTENDED $tbl ${f.name}").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val nulls = opt(cs, "num_nulls").map(_.toLong)
      val avgLen = opt(cs, "avg_col_len").map(_.toLong)
      (f.name,
        for (a <- avgLen; n <- rowCount) yield a * n, // data_size
        opt(cs, "distinct_count").map(_.toLong),
        for (nn <- nulls; n <- rowCount; if n > 0) yield nn.toDouble / n,
        Option.empty[Long],
        opt(cs, "min"),
        opt(cs, "max"))
    }
    val summary = (null.asInstanceOf[String], Option.empty[Long],
      Option.empty[Long], Option.empty[Double], rowCount,
      Option.empty[String], Option.empty[String])
    (colRows :+ summary).toDF("column_name", "data_size",
      "distinct_values_count", "nulls_fraction", "row_count",
      "low_value", "high_value")
  }
}
