package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateTimeCompat

/** Unit tests for the Joda→java.time pattern translation and the
  * TIME-as-nanos emulation. */
class DateTimeCompatSpec extends AnyFunSuite {

  test("joda pattern translation maps divergent letters") {
    assert(DateTimeCompat.translateJodaPattern("YYYY-MM-dd") == "yyyy-MM-dd")
    assert(DateTimeCompat.translateJodaPattern("xxxx-'Y'") == "YYYY-'Y'")
    assert(DateTimeCompat.translateJodaPattern("HH:mm Z") == "HH:mm XX")
    assert(DateTimeCompat.translateJodaPattern("HH:mm ZZ") == "HH:mm XXX")
    assert(DateTimeCompat.translateJodaPattern("'at' HH 'o''clock'") ==
      "'at' HH 'o''clock'")
  }

  test("joda-formatted output matches expectation") {
    val f = java.time.format.DateTimeFormatter
      .ofPattern(DateTimeCompat.translateJodaPattern("YYYY/MM/dd HH:mm:ss"))
      .withZone(java.time.ZoneOffset.UTC)
    val inst = java.time.Instant.parse("2024-02-29T13:05:07Z")
    assert(f.format(inst) == "2024/02/29 13:05:07")
  }

  test("parse_datetime inverts format_datetime; zone and date-only forms") {
    val ts = DateTimeCompat.parseDatetime("2024/02/29 13:05:07", "YYYY/MM/dd HH:mm:ss")
    assert(ts.toInstant == java.time.Instant.parse("2024-02-29T13:05:07Z"))
    // a parsed offset is honored (Joda Z → java XX)
    val zoned = DateTimeCompat.parseDatetime(
      "2024/02/29 13:05:07 +0900", "YYYY/MM/dd HH:mm:ss Z")
    assert(zoned.toInstant == java.time.Instant.parse("2024-02-29T04:05:07Z"))
    // bare date parses to UTC midnight
    val d = DateTimeCompat.parseDatetime("2024/02/29", "YYYY/MM/dd")
    assert(d.toInstant == java.time.Instant.parse("2024-02-29T00:00:00Z"))
  }

  test("to_iso8601 / from_iso8601 round-trips") {
    val i = java.time.Instant.parse("2001-08-22T03:04:05.321Z")
    val ts = java.sql.Timestamp.from(i)
    assert(DateTimeCompat.toIso8601(ts) == "2001-08-22T03:04:05.321")
    // whole seconds print without a fraction
    val whole = java.sql.Timestamp.from(java.time.Instant.parse("2001-08-22T03:04:05Z"))
    assert(DateTimeCompat.toIso8601(whole) == "2001-08-22T03:04:05")
    assert(DateTimeCompat.fromIso8601Timestamp("2001-08-22T03:04:05.321") == ts)
    // offset form lands on the instant; date-only form is midnight
    assert(DateTimeCompat.fromIso8601Timestamp("2001-08-22T12:04:05+09:00").toInstant
      == java.time.Instant.parse("2001-08-22T03:04:05Z"))
    assert(DateTimeCompat.fromIso8601Timestamp("2001-08-22").toInstant
      == java.time.Instant.parse("2001-08-22T00:00:00Z"))
  }

  test("time-of-day nanos and rendering") {
    // 1970-01-02 03:04:05.123456 UTC
    val micros = (86400L + 3 * 3600 + 4 * 60 + 5) * 1000000L + 123456L
    val n = DateTimeCompat.timeOfDayNanos(micros)
    assert(n == ((3 * 3600 + 4 * 60 + 5) * 1000000000L + 123456000L))
    assert(DateTimeCompat.nanosToTimeString(n) == "03:04:05.123456")
    assert(DateTimeCompat.nanosToTimeString(7 * 3600 * 1000000000L) == "07:00:00")
    // pre-epoch timestamps still land in [0, day)
    assert(DateTimeCompat.timeOfDayNanos(-1L) == 86400000000000L - 1000L)
  }
}
