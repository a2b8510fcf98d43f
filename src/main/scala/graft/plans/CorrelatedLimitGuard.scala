package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, BinaryComparison, Cast, Expression, Not, Or, OuterReference, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan}

/** Fail-loud guard for a Spark wrong-result decorrelation: a
  * correlated subquery containing a LIMIT whose correlation condition
  * compares against a COMPOUND expression over outer columns (e.g.
  * `t.a = outer.b * outer.c - 1`) is planned by Spark 4.1 with the
  * limit hoisted ABOVE the decorrelated join — one global result
  * survives instead of one per correlation key, so other outer rows
  * silently get NULL (reproduced on bare Spark; the reference plans a
  * per-partition row_number instead — sql/query/TestSubqueries
  * testCorrelatedSubqueriesWithLimit*). Bare-attribute correlations
  * (`t.a = outer.b`, with or without GROUP BY, any limit, TopN)
  * decorrelate correctly and pass through; only the compound form is
  * rejected, with the reference's own UNSUPPORTED posture — a loud
  * error beats a silently wrong answer.
  */
object CorrelatedLimitGuard extends (LogicalPlan => Unit) {

  private def hasOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[OuterReference])

  /** A comparison operand is fine when it is a bare (possibly cast)
    * outer reference, or contains no outer reference at all. */
  private def operandOk(e: Expression): Boolean = e match {
    case _: OuterReference => true
    case c: Cast => operandOk(c.child)
    case other => !hasOuter(other)
  }

  /** Predicate shape check: outer references may only appear as bare
    * comparison operands under AND/OR/NOT. */
  private def predOk(e: Expression): Boolean = e match {
    case And(l, r) => predOk(l) && predOk(r)
    case Or(l, r) => predOk(l) && predOk(r)
    case Not(c) => predOk(c)
    case b: BinaryComparison => b.children.forall(operandOk)
    case other => !hasOuter(other)
  }

  private def compoundOuterBelow(p: LogicalPlan): Boolean =
    p.exists(node => node.expressions.exists(e => hasOuter(e) && !predOk(e)))

  private def badShape(subPlan: LogicalPlan): Boolean =
    subPlan.exists {
      case l: GlobalLimit => compoundOuterBelow(l.child)
      case l: LocalLimit => compoundOuterBelow(l.child)
      case _ => false
    }

  override def apply(plan: LogicalPlan): Unit =
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case s: SubqueryExpression if badShape(s.plan) =>
          throw new UnsupportedOperationException(
            "correlated subquery with LIMIT over a compound correlation " +
              "expression is not supported: Spark hoists the limit above " +
              "the decorrelated join (one global result instead of one per " +
              "correlation key). Alias the outer expression in the outer " +
              "query, or rewrite with max_by/min_by or a ranked window.")
        case _ => ()
      })
    }
}
