package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateArray, ElementAt, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Collapse `element_at(array(e1, …, en), ±k)` with a foldable in-bounds
  * index straight to the selected element — the engine-side analogue of
  * the reference's constant-folding of row/array field dereference
  * (`core/trino-main/.../sql/planner/iterative/rule/SimplifyExpressions.java`
  * via the IR optimizer; Spark's own `SimplifyExtractValueOps` does this
  * for `GetArrayItem`/`GetStructField` but not for `ElementAt`).
  *
  * Two wins:
  *  - the per-row `CreateArray` allocation disappears from the hot path
  *    (a pure projection of one child expression remains);
  *  - it sidesteps a genuine Spark codegen defect: `ElementAt.nullable`
  *    is computed from the SPECIFIC element a foldable index selects
  *    (non-nullable literal → nullable=false) while `doGenCode` still
  *    emits an `isNull = true` branch whenever the array's containsNull
  *    is true — referencing an isNull variable that was never declared,
  *    so the whole stage falls back to interpreted execution
  *    ("Expression project_isNull_N is not an rvalue").
  *
  * Out-of-bounds or zero indices are left untouched so the runtime
  * error contract (failOnError) and `defaultValueOutOfBound` semantics
  * are preserved bit-for-bit.
  */
object ConstantIndexElementAt extends Rule[LogicalPlan] {

  private def collapse(e: Expression): Expression = e match {
    case ea @ ElementAt(arr: CreateArray, Literal(idx: Int, _), None, _) =>
      val n = arr.children.size
      if (idx >= 1 && idx <= n) arr.children(idx - 1)
      else if (idx <= -1 && idx >= -n) arr.children(n + idx)
      else ea // 0 or out of bounds: keep the runtime-error behavior
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e: ElementAt => collapse(e) }
}
