package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_similarity(array<float>, array<float>) -> double` as a
  * native Catalyst expression with codegen — the hot-path scalar of the
  * similarity-search operators.
  *
  * Capability match: reference `core/trino-main/.../operator/scalar/
  * MathFunctions.java` (cosine_similarity). A native expression (vs a
  * Scala UDF) stays inside whole-stage codegen: no Row boxing, no
  * serialization of the array per call — at 100 TB of embeddings this
  * is the difference between a memory-bandwidth-bound scan and a
  * GC-bound one.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosineF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
