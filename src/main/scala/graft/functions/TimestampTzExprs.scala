package graft.functions

import java.time.{Instant, LocalDateTime, ZoneId, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the TIMESTAMP WITH TIME ZONE emulation
  * ([[TimestampTz]]; reference `spi/type/TimestampWithTimeZoneType
  * .java`, `scalar/DateTimeFunctions.java:210` to_iso8601).
  *
  * Why native expressions and not built-in compositions: the composed
  * form (`from_utc_timestamp` + offset arithmetic + string assembly)
  * is semantically right but costs ~40 Catalyst nodes PER CALL,
  * duplicated at every struct-field reference — on sc19 the plan walk
  * and per-row java.time formatting dominated wall-clock 10:1 over
  * useful work (the r14 verdict's worst bench ratio). One expression
  * node per operation keeps the tree flat, and the kernels avoid
  * java.time on the hot path:
  *
  *  - zone ids resolve through a [[ConcurrentHashMap]] keyed by the
  *    raw UTF8String (no per-row String allocation),
  *  - each zone memoizes its CURRENT OFFSET WINDOW [lo, hi) — the
  *    span between tzdb transitions containing the last-resolved
  *    instant. Real columns are clustered in time, so the per-row
  *    offset lookup is two comparisons; rows outside the window fall
  *    back to java.time's ZoneRules and re-memoize. DST correctness
  *    is unchanged: windows END at transitions by construction.
  *  - ISO-8601 rendering is integer math on epoch days (the civil-
  *    from-days algorithm, Howard Hinnant's public-domain date
  *    algorithms) straight into an ASCII byte array — no
  *    DateTimeFormatter, no intermediate String.
  *
  * Semantics are identical to the built-ins they replace:
  *   - [[TzKernel.wallMicros]]  ≡ from_utc_timestamp(instant, zone)
  *   - [[TzKernel.utcMicros]]   ≡ to_utc_timestamp(wall, zone)
  *   - [[TzKernel.iso8601]]     = wall rendered `yyyy-MM-dd'T'HH:mm:ss`
  *                                + offset suffix, `Z` at zero offset
  *                                (java.time ISO_OFFSET_DATE_TIME
  *                                behavior, seconds precision)
  */
object TzKernel {

  /** Offset window: `offsetSec` applies to instants in [lo, hi) micros.
    * `utcLo` is the instant floor for the wall→instant fast path: if
    * the window opened with a fall-back transition, wall clocks mapping
    * to instants in [lo, utcLo) are AMBIGUOUS and java.time resolves
    * them to the EARLIER offset (the previous window) — those must take
    * the slow path. */
  private final class Window(
      val lo: Long, val hi: Long, val offsetSec: Int, val utcLo: Long)

  private final class ZoneEntry(val zone: ZoneId) {
    val rules: java.time.zone.ZoneRules = zone.getRules
    @volatile var window: Window = _
  }

  private val zones = new ConcurrentHashMap[UTF8String, ZoneEntry]()

  private def entry(zone: UTF8String): ZoneEntry = {
    val cached = zones.get(zone)
    if (cached != null) cached
    else {
      val e = new ZoneEntry(ZoneId.of(zone.toString))
      // clone: the lookup key may alias a reused row buffer
      val prev = zones.putIfAbsent(zone.clone(), e)
      if (prev != null) prev else e
    }
  }

  private def instantOf(micros: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)

  /** Resolve the zone's offset at `micros`, memoizing the transition
    * window it came from. */
  private def offsetSec(e: ZoneEntry, micros: Long): Int = {
    val w = e.window
    if (w != null && micros >= w.lo && micros < w.hi) return w.offsetSec
    val inst = instantOf(micros)
    val off = e.rules.getOffset(inst).getTotalSeconds
    def micro(t: java.time.zone.ZoneOffsetTransition): Long =
      t.getInstant.getEpochSecond * 1000000L + t.getInstant.getNano / 1000L
    // window start: the transition AT or before inst. previousTransition
    // is strictly-before, so an instant exactly ON a transition needs
    // the nextTransition(inst - 1µs) probe or the window would span two
    // offset regimes.
    val start = {
      val t = e.rules.nextTransition(inst.minusNanos(1000))
      if (t != null && !t.getInstant.isAfter(inst)) t
      else e.rules.previousTransition(inst)
    }
    val next = e.rules.nextTransition(inst)
    val hi = if (next == null) Long.MaxValue else micro(next)
    val lo = if (start == null) Long.MinValue else micro(start)
    val overlap =
      if (start == null) 0L
      else math.max(0L, (start.getOffsetBefore.getTotalSeconds - off) * 1000000L)
    e.window = new Window(lo, hi, off, lo + overlap)
    off
  }

  /** Zone's UTC offset at the instant, seconds. */
  def offsetSeconds(micros: Long, zone: UTF8String): Long =
    offsetSec(entry(zone), micros).toLong

  /** ≡ from_utc_timestamp: the instant's wall clock in `zone`,
    * re-encoded as zone-less micros. */
  def wallMicros(micros: Long, zone: UTF8String): Long =
    micros + offsetSec(entry(zone), micros) * 1000000L

  /** ≡ to_utc_timestamp: zone-less micros read as a wall clock IN
    * `zone`, resolved to the instant (earlier offset at DST overlaps,
    * shifted forward at gaps — java.time's atZone resolution, which
    * matches Spark's convertTz). Fast path: if the candidate instant
    * under the memoized window's offset lands back inside that window
    * it is exact (no transition can intervene); otherwise java.time. */
  def utcMicros(micros: Long, zone: UTF8String): Long = {
    val e = entry(zone)
    val w = e.window
    if (w != null) {
      val cand = micros - w.offsetSec * 1000000L
      if (cand >= w.utcLo && cand < w.hi) return cand
    }
    val ldt = LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val zdt = ldt.atZone(e.zone)
    zdt.toEpochSecond * 1000000L + zdt.getNano / 1000L
  }

  private def put2(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = ('0' + v / 10).toByte
    b(at + 1) = ('0' + v % 10).toByte
  }

  /** ISO-8601 with offset suffix, seconds precision. Integer-math
    * civil-from-days (Hinnant's public-domain algorithms) — supports
    * years 0001-9999 (4-digit rendering, the fixture/tzdb range). */
  def iso8601(micros: Long, zone: UTF8String): UTF8String = {
    val off = offsetSec(entry(zone), micros)
    val wallSec = Math.floorDiv(micros, 1000000L) + off
    val days = Math.floorDiv(wallSec, 86400L)
    val secOfDay = Math.floorMod(wallSec, 86400L).toInt
    // civil-from-days
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = (z - era * 146097L).toInt
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y = yoe + era * 400L
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val year = (if (m <= 2) y + 1 else y).toInt
    val len = if (off == 0) 20 else 25
    val b = new Array[Byte](len)
    put2(b, 0, year / 100); put2(b, 2, year % 100)
    b(4) = '-'; put2(b, 5, m)
    b(7) = '-'; put2(b, 8, d)
    b(10) = 'T'
    put2(b, 11, secOfDay / 3600)
    b(13) = ':'; put2(b, 14, (secOfDay / 60) % 60)
    b(16) = ':'; put2(b, 17, secOfDay % 60)
    if (off == 0) b(19) = 'Z'
    else {
      b(19) = if (off < 0) '-' else '+'
      val a = Math.abs(off)
      put2(b, 20, a / 3600)
      b(22) = ':'
      put2(b, 23, (a / 60) % 60)
    }
    UTF8String.fromBytes(b)
  }
}

/** Shared shape of the three binary tz kernels. Declares input types so
  * analysis inserts the implicit casts the replaced built-ins
  * (from/to_utc_timestamp) would have (string datetimes coerce) and
  * wrong-typed calls fail at analysis, not codegen. */
abstract class TzBinaryExpr extends BinaryExpression with ImplicitCastInputTypes {
  protected def kernel: String
  override def inputTypes: Seq[DataType] = Seq(TimestampType, StringType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TzKernel.$kernel($a, $b)")
}

/** `tz_wall(instant, zone) -> timestamp` — from_utc_timestamp as one node. */
case class TzWall(left: Expression, right: Expression) extends TzBinaryExpr {
  override def dataType: DataType = TimestampType
  override protected def kernel: String = "wallMicros"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TzKernel.wallMicros(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TzWall =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tz_wall"
}

/** `tz_to_utc(wall, zone) -> timestamp` — to_utc_timestamp as one node. */
case class TzToUtc(left: Expression, right: Expression) extends TzBinaryExpr {
  override def dataType: DataType = TimestampType
  override protected def kernel: String = "utcMicros"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TzKernel.utcMicros(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TzToUtc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tz_to_utc"
}

/** `tz_iso8601(instant, zone) -> string` — the reference's
  * to_iso8601(timestamptz) rendering as one node. */
case class TzIso8601(left: Expression, right: Expression) extends TzBinaryExpr {
  override def dataType: DataType = StringType
  override protected def kernel: String = "iso8601"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TzKernel.iso8601(a.asInstanceOf[Long], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TzIso8601 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tz_iso8601"
}
