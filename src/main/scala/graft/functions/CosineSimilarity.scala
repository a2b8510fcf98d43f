package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, MapType}

/** `cosine_similarity(array<float>, array<float>) -> double` as a
  * native Catalyst expression with codegen — the hot-path scalar of the
  * similarity-search operators. Also accepts the reference's sparse
  * form `cosine_similarity(map(varchar,double), map(varchar,double))`
  * (dimension-keyed weights; a NULL weight yields NULL, disjoint key
  * sets yield 0) — interpreted-speed compat surface, not the ANN hot
  * path.
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

  // the sparse map form can yield NULL from non-null inputs (a NULL
  // weight inside either map)
  override def nullable: Boolean = true

  private def sparse: Boolean = left.dataType.isInstanceOf[MapType]

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (sparse)
      VectorOps.cosineSparse(a.asInstanceOf[MapData], b.asInstanceOf[MapData])
    else
      VectorOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (sparse)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""java.lang.Double ${ev.value}_r = graft.functions.VectorOps.cosineSparse($a, $b);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
           |""".stripMargin
      })
    else
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosineF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
