package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, ElementAt, Expression, GetStructField, Greatest, Least, Literal, TryEval}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, MapType, StructType}

import graft.functions.{NanAwareMinMax, NanAwareMinMaxBy}

/** The engine's reference-semantics resolution rewrites, fused into a
  * SINGLE traversal. Each rewrite is documented at its dedicated
  * object ([[BigIntArraySubscript]], [[RowSubscript]],
  * [[IeeeDoubleDivide]], [[graft.functions.NanAwareFloatingAggs]],
  * [[MapGroupingKeys]]); this object exists because the analyzer's
  * resolution batch runs to a FIXED POINT — injecting five separate
  * rules costs five full expression-tree scans per iteration per
  * query, a measured ~10% of suite wall-clock at sf0.1 (the bench's
  * per-query fixed overhead). One fused scan restores that. Every
  * branch is idempotent (each rewrite's output no longer matches its
  * own pattern), so fixed-point iteration terminates.
  */
object GraftResolutionRules extends Rule[LogicalPlan] {

  private def floating(e: Expression): Boolean =
    e.resolved && (e.dataType == DoubleType || e.dataType == FloatType)

  /** Expression rewrite with an explicit recursion so the IEEE-divide
    * branch can STOP at try_* wrappers (their NULL-on-error contract
    * depends on the inner ANSI error being raised — see
    * IeeeDoubleDivide's scaladoc). */
  private def rw(e0: Expression): Expression = e0 match {
    case t if t.isInstanceOf[TryEval] || t.prettyName.startsWith("try_") => t

    // reference subscripts: BIGINT array index (clamped narrow), and
    // positional row subscript
    case ea @ ElementAt(col, idx, _, _)
        if col.resolved && idx.resolved &&
          col.dataType.isInstanceOf[ArrayType] && idx.dataType == LongType =>
      val clamped = Least(Seq(
        Greatest(Seq(rw(idx), Literal(Int.MinValue.toLong))),
        Literal(Int.MaxValue.toLong)))
      ea.withNewChildren(Seq(rw(col), Cast(clamped, IntegerType)))
    case ElementAt(s, Literal(i: Int, IntegerType), None, _)
        if s.resolved && s.dataType.isInstanceOf[StructType] &&
          i >= 1 && i <= s.dataType.asInstanceOf[StructType].length =>
      GetStructField(rw(s), i - 1)

    // IEEE-754 double/float division (reference: bare JVM `/`);
    // try_divide is protected by the try_* stop above, not by eval
    // mode (Spark 4.1's Divide carries a NumericEvalContext there)
    case Divide(l, r, _)
        if l.resolved && r.resolved && l.dataType == r.dataType &&
          (l.dataType == DoubleType || l.dataType == FloatType) =>
      IeeeDiv(rw(l), rw(r))

    // NaN-skipping min/max family over floating-point inputs
    case Min(c) if floating(c) => NanAwareMinMax(rw(c), isMin = true)
    case Max(c) if floating(c) => NanAwareMinMax(rw(c), isMin = false)
    case MinBy(v, k) if v.resolved && floating(k) =>
      NanAwareMinMaxBy(rw(v), rw(k), isMin = true)
    case MaxBy(v, k) if v.resolved && floating(k) =>
      NanAwareMinMaxBy(rw(v), rw(k), isMin = false)

    case other => other.mapChildren(rw)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate
        if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.resolved) &&
          a.groupingExpressions.exists(_.dataType.isInstanceOf[MapType]) =>
      MapGroupingKeys(a).mapExpressions(rw)
    case p => p.mapExpressions(rw)
  }
}
