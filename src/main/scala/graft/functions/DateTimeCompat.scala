package graft.functions

import org.apache.spark.sql.SparkSession

/** Date/time compatibility layer (SURVEY §2.9 date/time gap-fill):
  *
  * 1. `format_datetime(ts, joda_pattern)` — the reference formats with
  *    Joda-Time patterns (`DateTimeFunctions.java` format_datetime);
  *    Spark's `date_format` speaks java.time. [[translateJodaPattern]]
  *    maps the divergent pattern letters so reference-dialect format
  *    strings keep working.
  *
  * 2. TIME-type emulation (SURVEY §1.3: Spark has no TIME type): a
  *    time-of-day is carried as nanos-of-day BIGINT with
  *    `time_of_day_nanos(ts)` / `nanos_to_time_string(n)` helpers —
  *    lossless for the reference's TIME(0..9), ordering- and
  *    equality-compatible.
  */
object DateTimeCompat {

  /** Translate a Joda-Time format pattern to a java.time
    * (DateTimeFormatter) pattern. Divergent letters:
    * Joda Y (year-of-era)       → java y
    * Joda x (weekyear)          → java Y
    * Joda e (day-of-week num)   → java e (compatible)
    * Joda Z (tz offset)         → java XX
    * Joda ZZ                    → java XXX
    * Literals in single quotes pass through untouched.
    */
  def translateJodaPattern(joda: String): String = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < joda.length) {
      val c = joda.charAt(i)
      if (c == '\'') { inQuote = !inQuote; out += c; i += 1 }
      else if (inQuote) { out += c; i += 1 }
      else {
        var run = 1
        while (i + run < joda.length && joda.charAt(i + run) == c) run += 1
        c match {
          case 'Y' => out ++= "y" * run
          case 'x' => out ++= "Y" * run
          case 'Z' => out ++= (if (run >= 2) "XXX" else "XX")
          case _ => out ++= c.toString * run
        }
        i += run
      }
    }
    out.toString
  }

  /** Nanos-of-day of a timestamp's local time (UTC session). */
  def timeOfDayNanos(epochMicros: Long): Long = {
    val microsPerDay = 86400000000L
    val m = ((epochMicros % microsPerDay) + microsPerDay) % microsPerDay
    m * 1000L
  }

  /** Render nanos-of-day as HH:mm:ss.fffffffff (TIME literal form). */
  def nanosToTimeString(nanos: Long): String = {
    val sec = nanos / 1000000000L
    val frac = nanos % 1000000000L
    val h = sec / 3600
    val m = (sec % 3600) / 60
    val s2 = sec % 60
    if (frac == 0) f"$h%02d:$m%02d:$s2%02d"
    else f"$h%02d:$m%02d:$s2%02d.${frac}%09d".replaceAll("0+$", "")
  }

  /** Parse a string with a Joda-Time pattern (reference
    * `DateTimeFunctions.java` parse_datetime) — the inverse of
    * `format_datetime`, through the same pattern translator. A parsed
    * zone/offset is honored; otherwise the local datetime is taken as
    * UTC (the session zone); a bare date parses to midnight. */
  def parseDatetime(s: String, jodaPattern: String): java.sql.Timestamp = {
    import java.time._
    import java.time.temporal.TemporalQuery
    val f = java.time.format.DateTimeFormatter
      .ofPattern(translateJodaPattern(jodaPattern))
    val best = f.parseBest(s,
      ((t: java.time.temporal.TemporalAccessor) => ZonedDateTime.from(t)):
        TemporalQuery[AnyRef],
      ((t: java.time.temporal.TemporalAccessor) => LocalDateTime.from(t)):
        TemporalQuery[AnyRef],
      ((t: java.time.temporal.TemporalAccessor) => LocalDate.from(t)):
        TemporalQuery[AnyRef])
    val instant = best match {
      case z: ZonedDateTime => z.toInstant
      case ldt: LocalDateTime => ldt.toInstant(ZoneOffset.UTC)
      case ld: LocalDate => ld.atStartOfDay.toInstant(ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(s"unparseable: $other")
    }
    java.sql.Timestamp.from(instant)
  }

  /** ISO-8601 rendering of a timestamp (reference
    * `DateTimeFunctions.java:199` to_iso8601): seconds always printed,
    * millis only when non-zero — `2001-08-22T03:04:05[.321]`. */
  def toIso8601(ts: java.sql.Timestamp): String = {
    val ldt = java.time.LocalDateTime.ofInstant(
      ts.toInstant, java.time.ZoneOffset.UTC)
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss").format(ldt)
    val millis = ldt.getNano / 1000000
    if (millis == 0) base else f"$base.$millis%03d"
  }

  /** Flexible ISO-8601 timestamp parse (reference
    * `DateTimeFunctions.java` from_iso8601_timestamp): offset and
    * fractional seconds optional, bare dates parse to midnight; a
    * missing offset means the session zone (UTC). */
  def fromIso8601Timestamp(s: String): java.sql.Timestamp = {
    import java.time._
    import java.time.temporal.TemporalQuery
    val instant =
      if (s.contains("T")) {
        java.time.format.DateTimeFormatter.ISO_DATE_TIME.parseBest(s,
          ((t: java.time.temporal.TemporalAccessor) => ZonedDateTime.from(t)):
            TemporalQuery[AnyRef],
          ((t: java.time.temporal.TemporalAccessor) => LocalDateTime.from(t)):
            TemporalQuery[AnyRef]) match {
          case z: ZonedDateTime => z.toInstant
          case l: LocalDateTime => l.toInstant(ZoneOffset.UTC)
          case other => throw new IllegalArgumentException(s"unparseable: $other")
        }
      } else LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)
    java.sql.Timestamp.from(instant)
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("format_datetime",
      (ts: java.sql.Timestamp, jodaPattern: String) => {
        if (ts == null || jodaPattern == null) null
        else java.time.format.DateTimeFormatter
          .ofPattern(translateJodaPattern(jodaPattern))
          .withZone(java.time.ZoneOffset.UTC)
          .format(ts.toInstant)
      })
    spark.udf.register("parse_datetime",
      (s: String, jodaPattern: String) =>
        if (s == null || jodaPattern == null) null
        else parseDatetime(s, jodaPattern))
    spark.udf.register("to_iso8601",
      (ts: java.sql.Timestamp) => if (ts == null) null else toIso8601(ts))
    spark.udf.register("from_iso8601_timestamp",
      (s: String) => if (s == null) null else fromIso8601Timestamp(s))
    spark.udf.register("from_iso8601_date",
      (s: String) =>
        if (s == null) null
        else java.sql.Date.valueOf(java.time.LocalDate.parse(s)))
    spark.udf.register("time_of_day_nanos",
      (ts: java.sql.Timestamp) =>
        if (ts == null) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(timeOfDayNanos(
          ts.getTime * 1000L + (ts.getNanos / 1000 % 1000))))
    spark.udf.register("nanos_to_time_string",
      (n: java.lang.Long) => if (n == null) null else nanosToTimeString(n))
  }
}
