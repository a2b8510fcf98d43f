package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_weight_sum(text) -> struct<w_sum bigint, n_tok bigint>`:
  * the p25 hashed-token linear-scorer kernel as ONE codegen'd pass —
  * lowercase, scan for maximal `[a-z]+` runs, hash each run
  * (md5("w:" + token), first 4 bytes as an unsigned int), map to a
  * weight `h % 1000 - 500`, and fold the exact LONG sum plus the
  * token count.
  *
  * Replaces the interpreted higher-order-function pipeline
  * `aggregate(filter(split(lower(text), "[^a-z]+"), _ <> ''), 0L,
  * acc + weight(tk))` — Spark evaluates HOF lambdas per ELEMENT in
  * interpreted mode, the r18 3.7×-vs-oracle constant factor on a
  * scan-only query. Same fix pattern as [[DotProduct]] (reference
  * lesson: a compiled scalar kernel, not an interpreted lambda
  * chain — `operator/scalar/MathFunctions.java`).
  *
  * Bit-compat contract with the formula it replaces (and the DuckDB
  * oracle): lowercasing is Spark's own UTF8String.toLowerCase (the
  * `lower()` kernel), so tokens match `split(lower(text), ...)`
  * exactly — including Unicode mappings that land IN [a-z]; the md5
  * prefix parse equals `conv(substring(md5(...), 1, 8), 16, 10)`.
  */
case class TokenWeightSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenWeightSum.schema

  override protected def nullSafeEval(input: Any): Any =
    TokenWeightSum.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenWeightSum.score($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)

  override def prettyName: String = "token_weight_sum"
}

object TokenWeightSum {

  val schema: StructType = StructType(Seq(
    StructField("w_sum", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def score(s: UTF8String): InternalRow = {
    // Spark's own lower() kernel, so token boundaries match
    // split(lower(text), "[^a-z]+") exactly
    val txt = s.toLowerCase.toString
    val n = txt.length
    val md = md5Local.get()
    // reusable "w:" + token byte buffer (tokens are pure ASCII a-z)
    var buf = new Array[Byte](64)
    buf(0) = 'w'; buf(1) = ':'
    var wSum = 0L
    var nTok = 0L
    var i = 0
    while (i < n) {
      val c = txt.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < n && { val d = txt.charAt(j); d >= 'a' && d <= 'z' }) j += 1
        val len = j - i
        if (len + 2 > buf.length) {
          val bigger = new Array[Byte](Integer.highestOneBit(len + 2) * 2)
          bigger(0) = 'w'; bigger(1) = ':'
          buf = bigger
        }
        var k = 0
        while (k < len) { buf(k + 2) = txt.charAt(i + k).toByte; k += 1 }
        md.reset()
        md.update(buf, 0, len + 2)
        val d = md.digest()
        // first 8 hex chars = first 4 digest bytes, as an unsigned int
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        wSum += h % 1000L - 500L
        nTok += 1L
        i = j
      } else i += 1
    }
    new GenericInternalRow(Array[Any](wSum, nTok))
  }
}
