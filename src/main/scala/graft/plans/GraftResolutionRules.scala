package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, ElementAt, Expression, GetStructField, Greatest, Least, Literal, Round, TryEval}
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

  private def integralTarget(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType ||
      dt == org.apache.spark.sql.types.ShortType ||
      dt == org.apache.spark.sql.types.ByteType

  /** Overflow-raising arithmetic applies to integral AND decimal
    * operands (the reference raises for both: Math.addExact /
    * DecimalOperators checkOverflow); double/float wrap to IEEE
    * infinities instead, like the reference. */
  private def ansiArithTarget(dt: org.apache.spark.sql.types.DataType): Boolean =
    integralTarget(dt) || dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]

  private def fractionalSource(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == DoubleType || dt == FloatType ||
      dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]

  private def isRound0(e: Expression): Boolean = e match {
    case Round(_, Literal(0, IntegerType), _) => true
    case _ => false
  }

  /** MAP values compare via their canonical sorted-entry array (same
    * canonicalization MapGroupingKeys uses for grouping keys). */
  private def mapCanon(e: Expression): Expression = e.dataType match {
    case _: MapType =>
      org.apache.spark.sql.catalyst.expressions.SortArray(
        org.apache.spark.sql.catalyst.expressions.MapEntries(e),
        Literal(true))
    case _ => e
  }

  private def hasMapIn(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: MapType => true
      case StructType(fs) => fs.exists(f => hasMapIn(f.dataType))
      case _ => false
    }

  /** Recursive map canonicalization for null-safe comparison: maps
    * become sorted entry arrays, structs rebuild with canonicalized
    * fields. Arrays OF maps stay put (SortArray's type check fails
    * loudly there, the engine's posture). */
  private def deepCanon(e: Expression): Expression = e.dataType match {
    case _: MapType => mapCanon(e)
    case st: StructType if hasMapIn(st) =>
      org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(
        st.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          Seq(Literal(f.name),
            deepCanon(GetStructField(e, i, Some(f.name))))
        })
    case _ => e
  }

  /** Expression rewrite with an explicit recursion so the IEEE-divide
    * branch can be SUPPRESSED inside try scopes (their NULL-on-error
    * contract depends on the inner ANSI error being raised — see
    * IeeeDoubleDivide's scaladoc). `inTry` marks that scope: every
    * OTHER rewrite still applies inside TRY (reference
    * TRY(CAST(0.8E0 AS BIGINT)) rounds like the bare cast; only the
    * divide lowering would erase the error TRY exists to catch). The
    * registered generic TRY() resolves to TryEval only on a LATER
    * fixed-point iteration, so the unresolved spelling opens the
    * scope too. */
  private def rw(e0: Expression, inTry: Boolean = false): Expression = e0 match {
    // try-scope openers: TryEval, try_*-named expressions, and the
    // Try* RuntimeReplaceable family (TryDivide etc. — their
    // prettyName delegates to the replacement, so match the class)
    case t if t.isInstanceOf[TryEval] || t.prettyName.startsWith("try_") ||
        t.getClass.getSimpleName.startsWith("Try") =>
      t.mapChildren(rw(_, inTry = true))
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if u.nameParts.last.equalsIgnoreCase("try") =>
      u.mapChildren(rw(_, inTry = true))

    // reference subscripts: BIGINT array index (clamped narrow), and
    // positional row subscript
    case ea @ ElementAt(col, idx, _, _)
        if col.resolved && idx.resolved &&
          col.dataType.isInstanceOf[ArrayType] && idx.dataType == LongType =>
      val clamped = Least(Seq(
        Greatest(Seq(rw(idx, inTry), Literal(Int.MinValue.toLong))),
        Literal(Int.MaxValue.toLong)))
      ea.withNewChildren(Seq(rw(col, inTry), Cast(clamped, IntegerType)))
    case ElementAt(s, Literal(i: Int, IntegerType), None, _)
        if s.resolved && s.dataType.isInstanceOf[StructType] &&
          i >= 1 && i <= s.dataType.asInstanceOf[StructType].length =>
      GetStructField(rw(s, inTry), i - 1)

    // Reference casts from floating point / decimal to an integral
    // type ROUND half-up (DoubleOperators.castToLong:
    // DoubleMath.roundToLong(value, HALF_UP); Decimals rescale the
    // same way) — Spark truncates toward zero. DuckDB also rounds, so
    // this aligns the engine with both the reference AND the oracle.
    // Rounding first is a no-op when the value is already integral,
    // which is also the idempotence guard: Round(x, 0) output is
    // integral-valued, so re-rounding can't change it, and the
    // explicit Round(_, 0) child check stops the re-wrap. Overflow
    // still raises through the Cast (ANSI), like the reference's
    // INVALID_CAST_ARGUMENT.
    case c: Cast
        if c.child.resolved && integralTarget(c.dataType) &&
          fractionalSource(c.child.dataType) && !isRound0(c.child) =>
      c.withNewChildren(Seq(Round(rw(c.child, inTry), Literal(0))))

    // reference integer division: int / int TRUNCATES toward zero and
    // keeps the common integral type (Spark lowers `/` to double
    // division for every input). Two shapes: the raw int/int Divide,
    // and the one TypeCoercion already rewrote to
    // Divide(Cast(l AS DOUBLE), Cast(r AS DOUBLE)) in an earlier
    // fixed-point iteration — recognized only when NEITHER cast is
    // user-specified (a user's explicit CAST(x AS DOUBLE)/y keeps
    // IEEE division). Division by zero raises like the reference
    // ("Division by zero") via ANSI eval; inside TRY scopes it is
    // NULL via TRY eval — both match the reference's try(). Spark's
    // IntegralDivide widens to BIGINT; the cast restores the
    // reference's common-supertype result (tinyint/tinyint → tinyint).
    // ALL Divide modes rewrite — TRY-mode included: the reference's
    // TRY(int/int) is still truncating integer division, only its
    // ERRORS become NULL, which the rw inTry threading provides by
    // wrapping the lowered division in TryEval. (An earlier guard
    // tried to exempt TRY-mode Divides but compared a
    // NumericEvalContext against an EvalMode — vacuously true — and
    // fixing the comparison broke try(5/2): 2, not 2.5.)
    case Divide(l0, r0, _) if {
      def bare(e: Expression): Option[Expression] = e match {
        case e if e.resolved && integralTarget(e.dataType) => Some(e)
        case c: Cast
            if c.dataType == DoubleType && c.child.resolved &&
              integralTarget(c.child.dataType) &&
              c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
          Some(c.child)
        case _ => None
      }
      bare(l0).isDefined && bare(r0).isDefined
    } =>
      def bare(e: Expression): Expression = e match {
        case c: Cast if c.dataType == DoubleType => c.child
        case other => other
      }
      val (l, r) = (bare(l0), bare(r0))
      val wider =
        Seq(l.dataType, r.dataType).maxBy {
          case LongType => 4
          case IntegerType => 3
          case org.apache.spark.sql.types.ShortType => 2
          case _ => 1
        }
      // ANSI raises on /0 like the reference; in a try scope the
      // raise must be CAUGHT here with an explicit TryEval —
      // IntegralDivide's TRY mode still throws, counting on a
      // wrapper that no longer exists once RuntimeReplaceables swap
      val div = Cast(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          rw(l, inTry), rw(r, inTry),
          org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI),
        wider)
      if (inTry) TryEval(div) else div

    // reference ROW equality (RowOperators / TestRowOperators.java):
    // field-wise THREE-VALUED equality — any unequal non-null pair
    // decides false, otherwise any null-involved pair makes the
    // comparison NULL (Spark's struct '=' treats field nulls as
    // ordinary values: null==null true, null==2 false). Lowered to an
    // AND chain of field equalities, whose SQL 3VL is exactly the
    // standard's row-comparison rule; MAP-typed fields (and bare
    // map = map, which Spark rejects as unorderable) compare via the
    // canonical sorted-entry array — entry order insensitive, like
    // the reference's map equality.
    case eq @ org.apache.spark.sql.catalyst.expressions.EqualTo(l, r)
        if l.resolved && r.resolved &&
          l.dataType.isInstanceOf[StructType] &&
          org.apache.spark.sql.types.DataType.equalsStructurally(
            l.dataType, r.dataType, ignoreNullability = true) =>
      val st = l.dataType.asInstanceOf[StructType]
      val ll = rw(l, inTry)
      val rr = rw(r, inTry)
      // A bare AND chain IS the standard's row-equality 3VL: any
      // unequal non-null pair → false dominates; a NULL struct makes
      // every field accessor NULL → the chain is NULL; all-equal →
      // true. No null-guard wrapper: each conjunct stays an
      // equi-predicate, so ON a.s = b.s still extracts hash-join keys
      // (a guard expression would demote struct-keyed joins to
      // nested-loop at scale).
      st.fields.indices.map { i =>
        org.apache.spark.sql.catalyst.expressions.EqualTo(
          mapCanon(GetStructField(ll, i, Some(st.fields(i).name))),
          mapCanon(GetStructField(rr, i, Some(st.fields(i).name))))
            : Expression
      }.reduceLeftOption[Expression](
        org.apache.spark.sql.catalyst.expressions.And(_, _))
        .getOrElse(Literal(true))
    case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r)
        if l.resolved && r.resolved && l.dataType.isInstanceOf[MapType] &&
          org.apache.spark.sql.types.DataType.equalsStructurally(
            l.dataType, r.dataType, ignoreNullability = true) =>
      org.apache.spark.sql.catalyst.expressions.EqualTo(
        mapCanon(rw(l, inTry)), mapCanon(rw(r, inTry)))
    // IS [NOT] DISTINCT FROM over maps / map-carrying rows: Spark's
    // EqualNullSafe rejects unorderable types; the reference's
    // distinct-from is defined for them (TestMapOperators
    // testDistinctFrom, TestRowOperators testIsDistinctFrom) —
    // canonicalize maps to sorted entry arrays recursively
    case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(l, r)
        if l.resolved && r.resolved && hasMapIn(l.dataType) &&
          org.apache.spark.sql.types.DataType.equalsStructurally(
            l.dataType, r.dataType, ignoreNullability = true) =>
      org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
        deepCanon(rw(l, inTry)), deepCanon(rw(r, inTry)))

    // reference integer ARITHMETIC raises on overflow (Math.addExact
    // in BigintOperators/IntegerOperators — NUMERIC_VALUE_OUT_OF_RANGE);
    // Spark's legacy mode wraps silently. Convert integral-typed
    // +/-/*/negate and SUM to ANSI eval: inside TRY scopes the raise
    // is caught by the enclosing TryEval (→ NULL, like the
    // reference's try()); TRY-mode nodes (try_add family) keep
    // Spark's own contract. Wrapping-by-design hash mixing uses the
    // dedicated CombineHash expression, not these operators.
    case a @ org.apache.spark.sql.catalyst.expressions.Add(l, r,
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
        if l.resolved && r.resolved &&
          ansiArithTarget(l.dataType) && ansiArithTarget(r.dataType) =>
      org.apache.spark.sql.catalyst.expressions.Add(rw(l, inTry), rw(r, inTry),
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
    case s @ org.apache.spark.sql.catalyst.expressions.Subtract(l, r,
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
        if l.resolved && r.resolved &&
          ansiArithTarget(l.dataType) && ansiArithTarget(r.dataType) =>
      org.apache.spark.sql.catalyst.expressions.Subtract(rw(l, inTry), rw(r, inTry),
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
    case m @ org.apache.spark.sql.catalyst.expressions.Multiply(l, r,
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
        if l.resolved && r.resolved &&
          ansiArithTarget(l.dataType) && ansiArithTarget(r.dataType) =>
      org.apache.spark.sql.catalyst.expressions.Multiply(rw(l, inTry), rw(r, inTry),
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
    case m @ org.apache.spark.sql.catalyst.expressions.Remainder(l, r,
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
        if l.resolved && r.resolved &&
          integralTarget(l.dataType) && integralTarget(r.dataType) =>
      val rem = org.apache.spark.sql.catalyst.expressions.Remainder(
        rw(l, inTry), rw(r, inTry),
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
      if (inTry) TryEval(rem) else rem
    case n @ org.apache.spark.sql.catalyst.expressions.UnaryMinus(c, false)
        if c.resolved && integralTarget(c.dataType) =>
      org.apache.spark.sql.catalyst.expressions.UnaryMinus(rw(c, inTry), true)
    case s: org.apache.spark.sql.catalyst.expressions.aggregate.Sum
        if s.child.resolved && ansiArithTarget(s.child.dataType) &&
          s.evalContext.evalMode == org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY =>
      org.apache.spark.sql.catalyst.expressions.aggregate.Sum(rw(s.child, inTry),
        org.apache.spark.sql.catalyst.expressions.NumericEvalContext(
          org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI,
          s.evalContext.allowDecimalPrecisionLoss))

    // IEEE-754 double/float division (reference: bare JVM `/`);
    // suppressed inside try scopes — not via eval mode (Spark 4.1's
    // Divide carries a NumericEvalContext under try_divide)
    case Divide(l, r, _)
        if !inTry && l.resolved && r.resolved && l.dataType == r.dataType &&
          (l.dataType == DoubleType || l.dataType == FloatType) =>
      IeeeDiv(rw(l, inTry), rw(r, inTry))

    // NaN-skipping min/max family over floating-point inputs
    case Min(c) if floating(c) => NanAwareMinMax(rw(c, inTry), isMin = true)
    case Max(c) if floating(c) => NanAwareMinMax(rw(c, inTry), isMin = false)
    case MinBy(v, k) if v.resolved && floating(k) =>
      NanAwareMinMaxBy(rw(v, inTry), rw(k, inTry), isMin = true)
    case MaxBy(v, k) if v.resolved && floating(k) =>
      NanAwareMinMaxBy(rw(v, inTry), rw(k, inTry), isMin = false)

    case other => other.mapChildren(rw(_, inTry))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate
        if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.resolved) &&
          a.groupingExpressions.exists(_.dataType.isInstanceOf[MapType]) =>
      MapGroupingKeys(a).mapExpressions(rw(_))
    case p => p.mapExpressions(rw(_))
  }
}
