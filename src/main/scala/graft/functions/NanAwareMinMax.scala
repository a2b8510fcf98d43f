package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Coalesce, Expression, GreaterThan, Greatest, If, IsNaN, IsNotNull, IsNull, Least, LessThan, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType}

/** Reference NaN semantics for min/max over DOUBLE/REAL (reference
  * `operator/aggregation/MinMaxCompare.java`, pinned by its
  * testMinMaxFloatingPointNaN vectors): NaN inputs are SKIPPED — the
  * aggregate returns the min/max of the non-NaN values — unless every
  * non-null input is NaN, in which case NaN itself is returned. Spark's
  * ordering instead ranks NaN above every value (max(5.5, NaN) = NaN),
  * so the [[NanAwareFloatingAggs]] resolution rule swaps Spark's
  * Min/Max for this two-slot declarative aggregate whenever the input
  * is floating-point.
  *
  * Buffer: (best non-NaN so far | null, saw-a-NaN flag) — same O(1)
  * state and codegen path as the builtin, one extra boolean.
  */
case class NanAwareMinMax(child: Expression, isMin: Boolean)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = if (isMin) "min" else "max"

  private lazy val best = AttributeReference("best", child.dataType)()
  private lazy val sawNan = AttributeReference("sawNan", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(best, sawNan)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, child.dataType), Literal(false))

  private def pick(a: Expression, b: Expression): Expression =
    if (isMin) Least(Seq(a, b)) else Greatest(Seq(a, b))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    // Least/Greatest skip nulls, and IsNaN(null) is false, so a null
    // input leaves `best` untouched on this branch
    If(IsNaN(child), best, pick(best, child)),
    Or(sawNan, And(IsNotNull(child), IsNaN(child))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    pick(best.left, best.right),
    Or(sawNan.left, sawNan.right))

  private lazy val nanLit: Literal = child.dataType match {
    case FloatType => Literal(Float.NaN)
    case _ => Literal(Double.NaN)
  }

  override lazy val evaluateExpression: Expression =
    If(IsNotNull(best), best,
      If(sawNan, nanLit, Literal.create(null, child.dataType)))

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): NanAwareMinMax = copy(child = c(0))
}

/** Reference NaN semantics for min_by/max_by with a DOUBLE/REAL key
  * (testMinMaxByFloatingPointNaN): NaN-keyed rows are skipped; if ONLY
  * NaN-keyed rows exist, one of their values is returned (the
  * first seen here — the reference leaves the pick unspecified).
  * Null-keyed rows are ignored outright, as in both engines.
  *
  * Buffer: (best key | null, its value, value of a NaN-keyed row).
  */
case class NanAwareMinMaxBy(valueExpr: Expression, keyExpr: Expression, isMin: Boolean)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(valueExpr, keyExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = if (isMin) "min_by" else "max_by"

  private lazy val bestKey = AttributeReference("bestKey", keyExpr.dataType)()
  private lazy val bestVal = AttributeReference("bestVal", valueExpr.dataType)()
  private lazy val nanVal = AttributeReference("nanVal", valueExpr.dataType)()
  private lazy val sawNan = AttributeReference("sawNan", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestKey, bestVal, nanVal, sawNan)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, keyExpr.dataType),
    Literal.create(null, valueExpr.dataType),
    Literal.create(null, valueExpr.dataType),
    Literal(false))

  private def beats(a: Expression, b: Expression): Expression =
    if (isMin) LessThan(a, b) else GreaterThan(a, b)

  override lazy val updateExpressions: Seq[Expression] = {
    val good = And(IsNotNull(keyExpr), Not(IsNaN(keyExpr)))
    val better = And(good, Or(IsNull(bestKey), beats(keyExpr, bestKey)))
    val isNanKey = And(IsNotNull(keyExpr), IsNaN(keyExpr))
    Seq(
      If(better, keyExpr, bestKey),
      If(better, valueExpr, bestVal),
      // keep the FIRST NaN-keyed row's value (sawNan gates the write)
      If(And(isNanKey, Not(sawNan)), valueExpr, nanVal),
      Or(sawNan, isNanKey))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = And(IsNotNull(bestKey.right),
      Or(IsNull(bestKey.left), beats(bestKey.right, bestKey.left)))
    Seq(
      If(takeRight, bestKey.right, bestKey.left),
      If(takeRight, bestVal.right, bestVal.left),
      If(sawNan.left, nanVal.left, nanVal.right),
      Or(sawNan.left, sawNan.right))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNotNull(bestKey), bestVal,
      If(sawNan, nanVal, Literal.create(null, valueExpr.dataType)))

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): NanAwareMinMaxBy =
    copy(valueExpr = c(0), keyExpr = c(1))
}

/** Swap Spark's Min/Max/MinBy/MaxBy for the NaN-skipping variants
  * whenever the ordered input is floating-point — the reference's
  * engine-wide contract. Non-floating inputs keep the builtins (and
  * their codegen) untouched. Runs at resolution so both SQL-registry
  * and DataFrame-API spellings are covered.
  */
object NanAwareFloatingAggs extends Rule[LogicalPlan] {

  private def floating(e: Expression): Boolean =
    e.resolved && (e.dataType == DoubleType || e.dataType == FloatType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Min(c) if floating(c) => NanAwareMinMax(c, isMin = true)
      case Max(c) if floating(c) => NanAwareMinMax(c, isMin = false)
      case MinBy(v, k) if k.resolved && floating(k) && v.resolved =>
        NanAwareMinMaxBy(v, k, isMin = true)
      case MaxBy(v, k) if k.resolved && floating(k) && v.resolved =>
        NanAwareMinMaxBy(v, k, isMin = false)
    }
}
