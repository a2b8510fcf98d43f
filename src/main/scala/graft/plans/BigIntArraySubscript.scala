package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, ElementAt, Expression, Greatest, Least, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** The reference's array subscript takes a BIGINT index
  * (`ArraySubscriptOperator.java` — `long index`), while Spark's
  * `element_at(array, i)` demands INT and refuses the implicit
  * narrowing, so `a[1 + CAST(round(rand()) AS BIGINT)]` (the
  * reference's own testArrays vector) fails analysis. This resolution
  * rule inserts the narrowing cast exactly where it is provably safe:
  * the index side of an array `element_at`. The index is clamped to
  * the Int range BEFORE the cast (a raw cast would wrap — 2^32+1
  * would alias index 1); JVM arrays hold < Int.MaxValue elements, so
  * the clamped sentinel is out of bounds for every realizable array
  * and ElementAt's own OOB contract (failOnError / NULL) is kept.
  */
object BigIntArraySubscript extends Rule[LogicalPlan] {

  private def fix(e: Expression): Expression = e match {
    case ea @ ElementAt(col, idx, _, _)
        if col.resolved && idx.resolved &&
          col.dataType.isInstanceOf[ArrayType] && idx.dataType == LongType =>
      val clamped = Least(Seq(
        Greatest(Seq(idx, Literal(Int.MinValue.toLong))),
        Literal(Int.MaxValue.toLong)))
      ea.withNewChildren(Seq(col, Cast(clamped, IntegerType)))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e: ElementAt => fix(e) }
}
