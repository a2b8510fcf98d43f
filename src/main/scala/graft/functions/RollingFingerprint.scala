package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_fingerprint(text, k, top)` — document fingerprinting via a
  * Rabin-Karp polynomial rolling hash over all character k-grams,
  * keeping the `top` smallest DISTINCT hash values (a bottom-k /
  * winnowing-style sketch). Two documents sharing k-gram content share
  * fingerprints, so an equi-join on the fingerprint value buckets
  * near-duplicate candidates without ever forming the N² pair space —
  * the same shuffle shape as MinHash-LSH but content-defined, the
  * standard fingerprinting design from Schleimer/Wilkerson/Aiken's
  * published winnowing paper. Capability-add for the LLM-data pipeline
  * (no reference operator; the reference's closest is ngrams() +
  * min-hashing composed manually).
  *
  * The hash is position-independent arithmetic mod P = 1e9+7 with base
  * B = 257 over UTF-16 code units, computed in O(n) per document by
  * rolling (add char in, subtract `c_out·B^(k-1)`), not O(n·k); every
  * intermediate stays < 2^63 so the DuckDB oracle reproduces the exact
  * values with per-position integer folds. Texts shorter than k yield
  * an empty array. Evaluation is a single scan-side projection;
  * per-row state is the O(top) TreeSet.
  */
case class RollingFingerprint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  private val B = 257L
  private val P = 1000000007L

  override def nullSafeEval(tAny: Any, kAny: Any, topAny: Any): Any = {
    val s = tAny.asInstanceOf[UTF8String].toString
    val k = kAny.asInstanceOf[Int]
    val top = topAny.asInstanceOf[Int]
    require(k >= 1 && top >= 1, s"rolling_fingerprint: k=$k top=$top must be >= 1")
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod P, for removing the outgoing character
    var bk = 1L
    var i = 1
    while (i < k) { bk = bk * B % P; i += 1 }
    val bottom = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    i = 0
    while (i < n) {
      if (i >= k) h = (h - s.charAt(i - k).toLong * bk % P + P) % P
      h = (h * B + s.charAt(i).toLong) % P
      if (i >= k - 1) {
        bottom.add(h)
        if (bottom.size > top) bottom.pollLast()
      }
      i += 1
    }
    val out = new Array[Long](bottom.size)
    val it = bottom.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RollingFingerprint =
    copy(first = f, second = s, third = t)
}
