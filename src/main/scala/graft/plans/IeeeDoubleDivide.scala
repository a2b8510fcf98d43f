package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Divide, Expression, TryEval}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** IEEE-754 floating-point division (`a / b` in Java, exactly): `1E0/0E0`
  * is Infinity, `0E0/0E0` is NaN — the reference's semantics for DOUBLE
  * and REAL division (`OperatorType.DIVIDE` on double is the bare JVM
  * `/`; see the reference's own testValuesWithNonTrivialType vector).
  * Spark offers neither behavior: ANSI mode raises DIVIDE_BY_ZERO even
  * for doubles and legacy mode returns NULL, so this codegen'd binary
  * expression carries the IEEE contract itself.
  */
case class IeeeDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType
  override def sql: String = s"(${left.sql} / ${right.sql})"

  override protected def nullSafeEval(a: Any, b: Any): Any = dataType match {
    case DoubleType => a.asInstanceOf[Double] / b.asInstanceOf[Double]
    case FloatType  => a.asInstanceOf[Float] / b.asInstanceOf[Float]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"($a / $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Resolution rule lowering resolved double/float `Divide` onto
  * [[IeeeDiv]]. Runs after type coercion has equalized the operand
  * types, so a single dataType check suffices; integral and decimal
  * division keep Spark's (and the reference's) error-on-zero contract.
  *
  * `try_divide` is deliberately EXCLUDED: its Spark contract is
  * NULL-on-zero and the sc8/dx1 fixtures pin it. Its analyzed form is
  * a `TryDivide` RuntimeReplaceable whose hidden replacement child is
  * a plain `Divide` (probed, not guessed — the sql rendering shows
  * only `try_divide(...)`), so the recursion STOPS at TryEval and at
  * every `try_`-named node rather than filtering on EvalMode
  * (rewriting the replacement would erase the error the try wrapper
  * exists to catch, and with it the NULL). Known
  * divergence: the reference's `TRY(a / b)` on doubles returns
  * Infinity (no error occurs, so TRY is a no-op there) where
  * `try_divide` returns NULL — the TRY mapping in Dialect documents
  * this.
  */
object IeeeDoubleDivide extends Rule[LogicalPlan] {

  private def rw(e: Expression): Expression = e match {
    case t if t.isInstanceOf[TryEval] || t.prettyName.startsWith("try_") => t
    // see GraftResolutionRules: generic TRY() is still unresolved when
    // this rule first fires
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if u.nameParts.last.equalsIgnoreCase("try") => u
    case Divide(l, r, _)
        if l.resolved && r.resolved && l.dataType == r.dataType &&
          (l.dataType == DoubleType || l.dataType == FloatType) =>
      IeeeDiv(rw(l), rw(r))
    case other => other.mapChildren(rw)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform { case p => p.mapExpressions(rw) }
}
