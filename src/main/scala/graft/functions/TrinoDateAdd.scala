package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_date_add('unit', n, date_or_ts)` — the reference dialect's
  * three-argument `date_add` (`core/trino-main/.../scalar/
  * DateTimeFunctions.java` date_add) with its *type-preserving* result:
  * a DATE input stays DATE for day-or-coarser units, a TIMESTAMP input
  * stays TIMESTAMP. Spark's own `timestampadd` always widens to
  * TIMESTAMP, which breaks schema parity for reference queries that add
  * days to a date column — so the Dialect layer routes day-or-coarser
  * `date_add` calls here (`sqlcompat/Dialect.scala`).
  *
  * Native codegen expression: internal DATE is days-since-epoch (int),
  * TIMESTAMP is micros-since-epoch (long); calendar units (month/
  * quarter/year) go through java.time at UTC — this engine pins the
  * session timezone to UTC (engine/Graft.scala), matching the
  * reference's instant-based arithmetic.
  */
case class TrinoDateAdd(unit: Expression, amount: Expression, input: Expression)
    extends TernaryExpression {

  override def first: Expression = unit
  override def second: Expression = amount
  override def third: Expression = input

  override def checkInputDataTypes(): TypeCheckResult = {
    if (unit.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"unit must be STRING, got ${unit.dataType.sql}")
    else if (!Seq(IntegerType, LongType).contains(amount.dataType))
      TypeCheckResult.TypeCheckFailure(s"amount must be integral, got ${amount.dataType.sql}")
    else if (!Seq(DateType, TimestampType).contains(input.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"input must be DATE or TIMESTAMP, got ${input.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = input.dataType

  override def prettyName: String = "graft_date_add"

  private def toLong(n: Any): Long = n match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(u: Any, n: Any, t: Any): Any =
    input.dataType match {
      case DateType =>
        TrinoDateAdd.addToDays(u.asInstanceOf[UTF8String].toString,
          toLong(n), t.asInstanceOf[Int])
      case _ =>
        TrinoDateAdd.addToMicros(u.asInstanceOf[UTF8String].toString,
          toLong(n), t.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (input.dataType == DateType) "addToDays" else "addToMicros"
    defineCodeGen(ctx, ev, (u, n, t) =>
      s"graft.functions.TrinoDateAdd.$fn($u.toString(), $n, $t)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TrinoDateAdd =
    copy(unit = newFirst, amount = newSecond, input = newThird)
}

object TrinoDateAdd {

  /** DATE path: days-since-epoch in, days-since-epoch out. */
  def addToDays(unit: String, n: Long, days: Int): Int = unit.toLowerCase match {
    case "day" => Math.toIntExact(days + n)
    case "week" => Math.toIntExact(days + 7L * n)
    case "month" => Math.toIntExact(LocalDate.ofEpochDay(days).plusMonths(n).toEpochDay)
    case "quarter" => Math.toIntExact(LocalDate.ofEpochDay(days).plusMonths(3L * n).toEpochDay)
    case "year" => Math.toIntExact(LocalDate.ofEpochDay(days).plusYears(n).toEpochDay)
    case other => throw new UnsupportedOperationException(
      s"date_add unit '$other' is not valid for a DATE input")
  }

  /** TIMESTAMP path: micros-since-epoch in/out; calendar months at UTC. */
  def addToMicros(unit: String, n: Long, micros: Long): Long = unit.toLowerCase match {
    case "millisecond" => micros + n * 1000L
    case "second" => micros + n * 1000000L
    case "minute" => micros + n * 60000000L
    case "hour" => micros + n * 3600000000L
    case "day" => micros + n * 86400000000L
    case "week" => micros + n * 7L * 86400000000L
    case "month" | "quarter" | "year" =>
      val factor = unit.toLowerCase match {
        case "month" => 1L
        case "quarter" => 3L
        case _ => 12L
      }
      val ldt = LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      val out = ldt.plusMonths(factor * n)
      out.toEpochSecond(ZoneOffset.UTC) * 1000000L + out.getNano / 1000L
    case other => throw new UnsupportedOperationException(
      s"date_add unit '$other' is not supported")
  }
}
