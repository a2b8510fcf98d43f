package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `trim_array(arr, n)` with the reference's argument contract
  * (`operator/scalar/ArrayTrimFunction.java`, vectors in
  * `TestArrayTrimFunction.java`): drops the last `n` elements;
  * `n < 0` raises "size must not be negative: n" and `n > cardinality`
  * raises "size must not exceed array cardinality len: n" — a plain
  * `slice()` lowering is silently lenient on both, so this is a
  * dedicated expression. Low-volume utility scalar → interpreted
  * (CodegenFallback) is the right cost tier. */
case class TrimArray(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType
  override def prettyName: String = "trim_array"

  private lazy val elementType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(arr: Any, n: Any): Any = {
    val data = arr.asInstanceOf[ArrayData]
    val k = n.asInstanceOf[Number].longValue()
    if (k < 0) throw new IllegalArgumentException(
      s"size must not be negative: $k")
    if (k > data.numElements()) throw new IllegalArgumentException(
      s"size must not exceed array cardinality ${data.numElements()}: $k")
    new GenericArrayData(
      data.toObjectArray(elementType).dropRight(k.toInt))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `combine_hash(h1, h2)` = `31*h1 + h2` WRAPPING (reference
  * CombineHashFunction.java — hash mixing relies on two's-complement
  * wraparound). A dedicated codegen expression: the engine's integer
  * arithmetic is ANSI (overflow raises, like the reference), so hash
  * mixing cannot ride the generic `+`/`*` operators. */
case class CombineHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "combine_hash"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    31L * a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(31L * $a + $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `contains_sequence(arr, seq)` (reference `operator/scalar/
  * ArrayContainsSequence.java`): true iff `seq` occurs in `arr` as a
  * CONTIGUOUS subsequence (an empty sequence is always contained).
  * Generic over any element type — elements compare with the type's
  * interpreted ordering, NULL elements compare equal to NULL (the
  * reference's positional identity semantics, pinned by its
  * `ARRAY[3, NULL, 4]` vector). */
case class ContainsSequence(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "contains_sequence"

  private lazy val elemType = {
    require(
      org.apache.spark.sql.types.DataType.equalsStructurally(
        left.dataType, right.dataType, ignoreNullability = true),
      s"contains_sequence arguments must be arrays of the same element " +
        s"type, got ${left.dataType.sql} and ${right.dataType.sql}")
    left.dataType.asInstanceOf[ArrayType].elementType
  }
  private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(elemType)

  override protected def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val seq = s.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = seq.numElements()
    def at(d: ArrayData, i: Int): Any =
      if (d.isNullAt(i)) null else d.get(i, elemType)
    def eq(x: Any, y: Any): Boolean =
      if (x == null || y == null) x == null && y == null
      else ord.equiv(x, y)
    m == 0 || (0 to n - m).exists { i =>
      (0 until m).forall(j => eq(at(arr, i + j), at(seq, j)))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `word_stem(word[, lang])` (reference WordStemFunction.java — a
  * Snowball stemmer per language code). This engine ships the English
  * Snowball ("Porter2") stemmer — the same algorithm the reference
  * binds for `'en'` and the default overload; other language codes
  * raise — a documented subset, not a silent wrong answer. */
case class WordStem(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 1 || children.length == 2,
    "word_stem takes 1 or 2 arguments")
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "word_stem"
  override def eval(input: InternalRow): Any = {
    val w = children.head.eval(input)
    if (w == null) return null
    if (children.length == 2) {
      val lang = children(1).eval(input)
      if (lang == null) return null
      val code = lang.toString
      if (code != "en") throw new IllegalArgumentException(
        s"Unknown stemmer language: $code (this engine ships the English stemmer)")
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      SnowballEnglish.stem(w.toString))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren)
}
