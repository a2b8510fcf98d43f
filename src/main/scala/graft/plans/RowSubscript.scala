package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ElementAt, GetStructField, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

/** The reference's subscript operator also applies to ROW values —
  * `ROW(1, 'a', true)[2]` is field 2, 1-based
  * (`RowToRowCast`/`SqlBase.g4` subscript over row types) — while
  * Spark's `element_at` is arrays/maps only. The dialect lowers every
  * subscript onto `element_at`, so a struct operand with a positive
  * in-bounds integer literal resolves here to the `GetStructField` it
  * denotes before the type check rejects it. Non-literal or
  * out-of-bounds subscripts keep Spark's loud analysis error (the
  * reference errors on those too — row subscripts must be constant).
  */
object RowSubscript extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ElementAt(s, Literal(i: Int, IntegerType), None, _)
          if s.resolved && s.dataType.isInstanceOf[StructType] &&
            i >= 1 && i <= s.dataType.asInstanceOf[StructType].length =>
        GetStructField(s, i - 1)
    }
}
