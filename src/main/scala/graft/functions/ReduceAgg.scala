package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Generic user-programmable reduction aggregate (reference
  * `operator/aggregation/ReduceAggregationFunction.java`:
  * `reduce_agg(value, initialState, inputFn, combineFn)`).
  *
  * The reference takes SQL lambdas; Spark's idiomatic SPI for a
  * user-supplied fold is the typed [[Aggregator]], so this surfaces
  * as a Scala API producing a [[Column]] usable in any `agg(...)`.
  * The two closures mirror the reference contract exactly: `input`
  * folds a value into the state, `combine` merges two partial states
  * (must be commutative/associative for a deterministic distributed
  * result, same caveat the reference documents). Partial aggregation
  * applies automatically — state size is whatever `S` is.
  */
object ReduceAgg {

  private case class FunctionalAggregator[T, S](
      z: S,
      input: (S, T) => S,
      comb: (S, S) => S,
      enc: Encoder[S])
      extends Aggregator[T, S, S] {
    override def zero: S = z
    override def reduce(b: S, a: T): S = input(b, a)
    override def merge(b1: S, b2: S): S = comb(b1, b2)
    override def finish(r: S): S = r
    override def bufferEncoder: Encoder[S] = enc
    override def outputEncoder: Encoder[S] = enc
  }

  /** `reduceAgg(0L, (s, x) => s + x, _ + _)(col)` — the reference's
    * reduce_agg(x, 0, (s, x) -> s + x, (a, b) -> a + b). */
  def reduceAgg[T, S](zero: S, input: (S, T) => S, combine: (S, S) => S)(
      c: Column)(implicit tEnc: Encoder[T], sEnc: Encoder[S]): Column =
    udaf(FunctionalAggregator(zero, input, combine, sEnc), tEnc)(c)
}
