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

  test("TzKernel matches java.time across DST transitions, zones, and eras") {
    import graft.functions.TzKernel
    import java.time._
    import org.apache.spark.unsafe.types.UTF8String
    val zones = Seq("UTC", "Asia/Tokyo", "Asia/Kolkata",
      "America/New_York", "Europe/Berlin", "Australia/Lord_Howe") // :30 DST
    // instants straddling both 2024 US/EU transitions, a far past and
    // future, plus dense minutes around the New York spring-forward
    val base = Seq(
      "1920-06-01T12:00:00Z", "1969-12-31T23:59:59Z",
      "2024-03-10T06:59:00Z", "2024-03-10T07:00:00Z", "2024-03-10T07:01:00Z",
      "2024-11-03T05:59:00Z", "2024-11-03T06:00:00Z", "2024-11-03T06:30:00Z",
      "2024-03-31T00:59:00Z", "2024-03-31T01:00:00Z",
      "2030-07-15T01:02:03Z").map(Instant.parse(_))
    val probes = base ++ base.map(_.plusSeconds(86400L * 97)) // shuffle order
    for (z <- zones; inst <- probes.reverse ++ probes) {
      val u8 = UTF8String.fromString(z)
      val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      val zid = ZoneId.of(z)
      val off = zid.getRules.getOffset(inst).getTotalSeconds
      assert(TzKernel.offsetSeconds(micros, u8) == off.toLong, s"$z $inst offset")
      assert(TzKernel.wallMicros(micros, u8) == micros + off * 1000000L,
        s"$z $inst wall")
      // iso8601 vs java.time rendering (seconds precision)
      val odt = inst.atZone(zid).toOffsetDateTime
      val want = odt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss")) + (
        if (off == 0) "Z"
        else {
          val a = math.abs(off)
          f"${if (off < 0) "-" else "+"}${a / 3600}%02d:${(a / 60) % 60}%02d"
        })
      assert(TzKernel.iso8601(micros, u8).toString == want, s"$z $inst iso")
      // utcMicros vs LocalDateTime.atZone (gap/overlap resolution)
      val wall = micros + off * 1000000L
      val ldt = LocalDateTime.ofEpochSecond(Math.floorDiv(wall, 1000000L),
        (Math.floorMod(wall, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      val zdt = ldt.atZone(zid)
      val wantUtc = zdt.toEpochSecond * 1000000L + zdt.getNano / 1000L
      assert(TzKernel.utcMicros(wall, u8) == wantUtc, s"$z $inst to_utc")
    }
    // wall clocks INSIDE a gap and an overlap resolve like java.time
    for ((wallStr, z) <- Seq(
        ("2024-03-10T02:30:00", "America/New_York"), // spring-forward gap
        ("2024-11-03T01:30:00", "America/New_York"))) { // fall-back overlap
      val ldt = LocalDateTime.parse(wallStr)
      val wall = ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L
      val zdt = ldt.atZone(ZoneId.of(z))
      val want = zdt.toEpochSecond * 1000000L
      assert(TzKernel.utcMicros(wall, UTF8String.fromString(z)) == want,
        s"$z $wallStr gap/overlap")
    }
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
