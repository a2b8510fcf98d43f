package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels called from both interpreted eval and
  * generated code (whole-stage codegen emits a plain static call, so
  * the expression stays inside the generated loop — the same trick the
  * reference uses for its compiled scalar functions,
  * `sql/gen/ExpressionCompiler.java:57`).
  *
  * Arithmetic contract: float elements are widened to double and
  * reduced with one sequential left fold — the documented deterministic
  * order every other cosine in this engine (and the DuckDB oracle
  * formulation) uses, so results are bit-identical across engines and
  * across partitionings.
  */
object VectorOps {

  /** Sequential-fold dot product; each side is float or double typed
    * (the flags are codegen-time constants, so JIT folds the branch).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Sequential-fold cosine similarity over two float arrays. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
