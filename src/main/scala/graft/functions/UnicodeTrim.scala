package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's no-argument TRIM family trims every UNICODE
  * whitespace code point (`operator/scalar/StringFunctions.java:478`
  * leftTrim → airlift SliceUtf8, whose whitespace set is
  * `Character.isWhitespace` — the `sql/query/TestTrim.java` corpus
  * pins U+2028 LINE SEPARATOR as trimmed), while Spark's trim family
  * strips only ASCII space. These kernels carry the reference
  * semantics for dialect-translated `TRIM([LEADING|TRAILING|BOTH
  * FROM] x)` forms; parametrized TRIM (explicit code-point set) maps
  * to Spark's native set-based trim, which already agrees. */
object UTrimKernel {
  private def isWs(cp: Int): Boolean = Character.isWhitespace(cp)

  def left(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    while (i < str.length && isWs(str.codePointAt(i)))
      i += Character.charCount(str.codePointAt(i))
    if (i == 0) s else UTF8String.fromString(str.substring(i))
  }

  def right(s: UTF8String): UTF8String = {
    val str = s.toString
    var e = str.length
    while (e > 0 && isWs(str.codePointBefore(e)))
      e -= Character.charCount(str.codePointBefore(e))
    if (e == str.length) s else UTF8String.fromString(str.substring(0, e))
  }

  def both(s: UTF8String): UTF8String = right(left(s))
}

abstract class UTrimExpr extends UnaryExpression with ImplicitCastInputTypes {
  protected def kernel: String
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UTrimKernel.$kernel($c)")
}

/** `u_trim(x)` — Unicode-whitespace BOTH trim. */
case class UTrimBoth(child: Expression) extends UTrimExpr {
  override protected def kernel: String = "both"
  override protected def nullSafeEval(v: Any): Any =
    UTrimKernel.both(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UTrimBoth =
    copy(child = newChild)
  override def prettyName: String = "u_trim"
}

/** `u_ltrim(x)` — Unicode-whitespace LEADING trim. */
case class UTrimLeft(child: Expression) extends UTrimExpr {
  override protected def kernel: String = "left"
  override protected def nullSafeEval(v: Any): Any =
    UTrimKernel.left(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UTrimLeft =
    copy(child = newChild)
  override def prettyName: String = "u_ltrim"
}

/** `u_rtrim(x)` — Unicode-whitespace TRAILING trim. */
case class UTrimRight(child: Expression) extends UTrimExpr {
  override protected def kernel: String = "right"
  override protected def nullSafeEval(v: Any): Any =
    UTrimKernel.right(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UTrimRight =
    copy(child = newChild)
  override def prettyName: String = "u_rtrim"
}
