package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{TypeCheckResult, TypeCoercion}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Reference-contract greatest/least: NULL when ANY argument is NULL
  * (`AbstractGreatestLeast.java` codegen; TestMathFunctions
  * `greatest(5, 4, NULL, 3)` → NULL) — Spark's builtins SKIP nulls.
  *
  * A dedicated expression rather than `If(anyNull, NULL, Greatest(c))`
  * so each argument is evaluated exactly ONCE per row: the wrapped
  * form duplicated every child into both the null guard and the
  * result, doubling cost for expensive arguments and — for
  * non-deterministic nullable arguments — letting the null check and
  * the result observe DIFFERENT evaluations.
  */
case class StrictGreatestLeast(children: Seq[Expression], isGreatest: Boolean)
    extends Expression {

  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = children.head.dataType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires at least two arguments")
    else if (children.map(_.dataType).distinct.length > 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName arguments must all be the same type " +
          s"(got ${children.map(_.dataType.simpleString).mkString(", ")})")
    else TypeUtils.checkForOrderingExpr(dataType, prettyName)
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dataType)

  override def eval(input: InternalRow): Any = {
    var best: Any = null
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      if (best == null ||
        (if (isGreatest) ordering.gt(v, best) else ordering.lt(v, best)))
        best = v
      i += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val javaType = CodeGenerator.javaType(dataType)
    val op = if (isGreatest) ">" else "<"
    val first = evals.head
    // each later child's evaluation nests under !isNull, so every
    // argument is evaluated at most once and never after a NULL
    val rest = evals.tail.map { e =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) {
         |    ${ev.isNull} = true;
         |  } else if (${ctx.genComp(dataType, e.value, ev.value)} $op 0) {
         |    ${ev.value} = ${e.value};
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      |${first.code}
      |boolean ${ev.isNull} = ${first.isNull};
      |$javaType ${ev.value} = ${first.value};
      |$rest
    """.stripMargin)
  }

  override def prettyName: String = if (isGreatest) "greatest" else "least"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StrictGreatestLeast =
    copy(children = newChildren)
}

object StrictGreatestLeast {
  /** Builder used at registration: Catalyst's Greatest/Least-specific
    * widening rules don't apply to a custom class, so coerce the
    * arguments to their wider common type here (children are resolved
    * when function builders run). */
  def build(args: Seq[Expression], isGreatest: Boolean): Expression = {
    val widened =
      if (args.forall(_.resolved) && args.map(_.dataType).distinct.length > 1)
        TypeCoercion.findWiderCommonType(args.map(_.dataType)) match {
          case Some(t) =>
            args.map(a => if (a.dataType == t) a else Cast(a, t))
          case None => args
        }
      else args
    StrictGreatestLeast(widened, isGreatest)
  }
}
