package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Exact-arithmetic helpers for oracle-comparable aggregates.
  *
  * The test measures are doubles with at most 2 decimal places
  * (FIXTURES.md). Summing doubles is order-dependent at the ulp level, so
  * a Spark sum and a DuckDB sum over the same 60k rows can hash-differ.
  * The reference avoids this by using exact decimal types for money
  * (witdb `DecimalType`, reference `spi/type/Decimals.java:45`); we do the
  * same *locally inside each aggregate*: cast to decimal (lossless for
  * 2-dp data), aggregate exactly, and cast the final scalar back to
  * double. Both engines then produce bit-identical results regardless of
  * row order or parallelism — which also means the plan stays fully
  * parallel at 100 TB (no single-partition tricks needed for
  * determinism).
  */
object Num {

  /** Money / measure values: lossless for |v| < 10^10 with 2 dp. */
  val Money: DecimalType = DecimalType(12, 2)

  /** Small factors like (1 - discount), (1 + tax): |v| < 100, 2 dp.
    * Kept narrow so products of three factors stay within 38 digits in
    * BOTH Spark and DuckDB decimal-widening rules (they differ!).
    */
  val Factor: DecimalType = DecimalType(4, 2)

  def money(c: Column): Column = c.cast(Money)
  def factor(c: Column): Column = c.cast(Factor)

  /** Order-independent sum of a 2-dp double column, returned as double. */
  def xsum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Order-independent avg: exact decimal sum / count, both engines do
    * the same single IEEE division.
    */
  def xavg(c: Column): Column = sum(money(c)).cast(DoubleType) / count(c)

  /** l_extendedprice * (1 - l_discount) — exact decimal product. */
  def revenue(price: Column, discount: Column): Column =
    money(price) * factor(lit(1) - discount)

  /** revenue * (1 + tax) — still exact, stays under 38 digits. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    revenue(price, discount) * factor(lit(1) + tax)

  /** Integer-valued counts normalized to bigint on both engines
    * (DuckDB SUM(int) yields HUGEINT; Spark yields bigint).
    */
  def lsum(c: Column): Column = sum(c).cast(LongType)
}
