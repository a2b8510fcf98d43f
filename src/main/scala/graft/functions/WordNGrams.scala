package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n) -> array<string>`: space-separated word
  * n-grams of `text`, each joined by a single space, as one compiled
  * pass — the scan-side tokenization kernel for the dedup family
  * (p3 shingles, p17 inverted-index Jaccard).
  *
  * Exists for the same reason as [[DotProduct]] (reference analogue:
  * the compiled `ngrams()` scalar in the reference's ArrayFunctions
  * rather than an interpreted lambda): the equivalent
  * `transform(sequence(...), i -> concat_ws(element_at...))` chain is
  * a higher-order function, which Spark evaluates by interpreting the
  * lambda per element — measured ~3 s per pass over a 5000-doc
  * fixture vs milliseconds compiled. Splitting matches
  * `split(text, ' ')` / DuckDB `string_split(text, ' ')` exactly:
  * single-space delimiter, empty tokens preserved, so oracle hashes
  * are unchanged. Fewer than n words → empty array (never null for
  * non-null input).
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects (string, int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(text: Any, n: Any): Any =
    TextOps.wordNGrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextOps.wordNGrams($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_ngrams"
}

/** Static text kernels shared by interpreted eval and generated code
  * (see [[VectorOps]] for the pattern). */
object TextOps {

  /** Word n-grams over a single-space split, one allocation-lean pass.
    * Empty tokens are preserved (split semantics), n-grams re-join
    * with single spaces. */
  def wordNGrams(text: UTF8String, n: Int): ArrayData = {
    require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
    val s = text.toString
    // split on the single-space delimiter, preserving empty tokens —
    // identical token stream to split(text, ' ') with -1 limit
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        words.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = words.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m - n + 1) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}
