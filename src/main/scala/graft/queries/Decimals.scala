package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Graft
import graft.engine.Num.{chargeU, decSumLong, revenueU, unscaled2dp}

/** Decimal-first semantics end-to-end (reference: money is
  * DecimalType ≤ 38 digits throughout — `spi/type/Decimals.java:45`,
  * `operator/aggregation/DecimalSumAggregation.java`,
  * `type/DecimalCasts.java`, division-scale rules in
  * `type/DecimalOperators.java`): the testdata measures land as
  * doubles (TESTDATA.md), the queries' declared semantics (the oracle
  * SQL) cast them to DECIMAL and keep every aggregate, product and
  * quotient in DECIMAL through to the output boundary.
  *
  * Physical execution (r21, guide §4 "eliminate non-codegen work in
  * the hot path"): the per-row arithmetic runs entirely in UNSCALED
  * LONG space — the JVM analog of the reference's int128 decimal
  * kernels (`spi/type/Int128Math.java`), which never materialize a
  * boxed decimal per row either. `unscaled2dp` recovers each 2-dp
  * double's exact scale-2 unscaled long (the exactness proof lives on
  * [[graft.engine.Num.unscaled2dp]]; it is the same integer the
  * previous shape's `cast(double AS DECIMAL(12,2))` produced via a
  * per-row BigDecimal allocation), products of unscaled operands are
  * exact integer products at the summed scale ([[Num.revenueU]] /
  * [[Num.chargeU]]), sums run as codegen'd long limb sums
  * ([[Num.decSumLong]]), and min/max compare unscaled longs (order-
  * isomorphic to the decimal order at fixed scale). Each group's limb
  * sums reassemble into ONE decimal at the end, so every decimal the
  * query is contractually required to produce still exists — there is
  * just never one per row. r20's dc1 plan carried
  * `cast(l_extendedprice as decimal(12,2))` per row per column (a
  * BigDecimal allocation each) plus decimal-typed min/max buffers;
  * r21's carries only long arithmetic below the final projection.
  * Outputs are bit-identical (DecimalEquivalenceSpec races both
  * shapes; the oracle hash gate pins all three queries at both SFs).
  *
  * Cross-engine typing contract: Spark and DuckDB WIDEN decimals
  * differently (Spark sum(DECIMAL(12,2)) → (22,2), DuckDB → (38,2);
  * products/quotients differ more), so every aggregate/derived column
  * is explicitly cast to a pinned target type on BOTH sides — the
  * same discipline a real multi-engine pipeline needs. Sums and
  * products are exact at any row order (the decimal point of using
  * them at 100 TB); the division result is pinned to scale 6 with
  * both engines' intermediates far wider than the target.
  *
  * Output-boundary contract: the FINAL output columns are cast to
  * DOUBLE on both engines. Rationale (round-9 driver gate failure):
  * the gate hashes stringified values, and pyarrow renders a parquet
  * DECIMAL(28,2) as `Decimal('508966.00')` while the DuckDB oracle
  * frame materializes float64 `508966.0` — trailing-zero strings
  * diverge even when values are exactly equal. Every value here is
  * far below 2^52 in scaled units (sums ≈ 10^10), so the final DOUBLE
  * cast is lossless (PropertiesSpec pins the 2^52 round-trip bound);
  * the exactness guarantee is carried by the exact integer/decimal
  * intermediates.
  */
object Decimals {

  /** Reassemble an unscaled scale-2 long aggregate (a min/max pick)
    * into its decimal value. Value-identical to aggregating the
    * decimal column directly: at fixed scale the unscaled-long order
    * IS the decimal order, and decimal→double casting depends only on
    * the value, not the precision it is carried at. */
  private def dec2(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    u.cast(DecimalType(32, 0)) * lit(java.math.BigDecimal.valueOf(1L, 2))

  // ------------------------------------------- dc1 decimal sum/min/max
  /** Decimal aggregation with decimal-typed semantics: exact sums (any
    * row order, any partitioning — DecimalSumAggregation semantics)
    * and exact min/max picks, executed in unscaled-long space. */
  def dc1(s: SparkSession, dir: String): DataFrame = {
    val uq = unscaled2dp(col("l_quantity"))
    val up = unscaled2dp(col("l_extendedprice"))
    Graft.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        decSumLong(uq, 2).cast(DecimalType(28, 2)).cast("double").as("sum_qty"),
        decSumLong(up, 2).cast(DecimalType(28, 2)).cast("double").as("sum_price"),
        dec2(min(up)).cast("double").as("min_price"),
        dec2(max(up)).cast("double").as("max_price"),
        count(lit(1)).as("n"))
  }

  val dc1Sql: String =
    """SELECT l_returnflag,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price,
      |  CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
      |  CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ------------------------------------- dc2 decimal product pipeline
  /** Decimal products through the revenue/charge chain: (12,2)×(4,2)
    * per-row products pinned to (18,4) (both engines' native product
    * types differ: Spark (17,4) vs DuckDB (16,4)), summed exactly;
    * revenue output pinned at (28,4), charge COARSENED to (28,2)
    * before the DOUBLE boundary (round-10 advisor finding: charge
    * sums pass 2^52 in scale-6 units at sf0.1, so a scale-6 DOUBLE
    * cast would lean on both engines' decimal->double rounding
    * agreeing bit-for-bit — a true-today, unguaranteed invariant).
    *
    * Execution: [[Num.revenueU]] is the exact scale-4 unscaled long of
    * the declared (18,4) product (integer product of exactly-recovered
    * unscaled operands — the value the previous shape computed with a
    * per-row Decimal multiply), [[Num.chargeU]] the exact scale-6
    * unscaled long of the (22,6) charge, whose VALUE fits a long per
    * row (≤ ~2.4e11) even though its DECIMAL type is past long-backed
    * precision 18. Same limb sums as before, zero per-row decimals. */
  def dc2(s: SparkSession, dir: String): DataFrame = {
    val uRev = revenueU(col("l_extendedprice"), col("l_discount"))
    val uChg = chargeU(col("l_extendedprice"), col("l_discount"), col("l_tax"))
    Graft.load(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        decSumLong(uRev, 4)
          .cast(DecimalType(28, 4)).cast("double").as("revenue"),
        // Output pinned at (28,2), NOT (32,6): per-group charge sums at
        // sf0.1 already exceed 2^52 in scale-6 units, where the final
        // DOUBLE cast would depend on both engines' decimal->double
        // rounding agreeing bit-for-bit. At scale-2 the scaled units
        // stay ~1e12, inside the PropertiesSpec-pinned 2^52 lossless
        // bound at this SF and for orders of magnitude beyond. Both
        // engines' round() rounds half away from zero on positives
        // (charge is always > 0), so the coarsening itself is
        // engine-independent — note it must be an EXPLICIT round():
        // a bare down-scaling CAST truncates in DuckDB but HALF_UPs
        // in Spark.
        round(decSumLong(uChg, 6).cast(DecimalType(32, 6)), 2)
          .cast(DecimalType(28, 2)).cast("double").as("charge"))
  }

  val dc2Sql: String =
    """SELECT l_linestatus,
      |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)))
      |    AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
      |  CAST(CAST(round(CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(22,6)))
      |    AS DECIMAL(32,6)), 2) AS DECIMAL(28,2)) AS DOUBLE) AS charge
      |FROM lineitem GROUP BY l_linestatus""".stripMargin

  // ---------------------------------------- dc3 decimal division scale
  /** Decimal division with a pinned result scale: average unit price =
    * exact decimal sum / exact decimal count-weight, operands cast to
    * (25,6) (overflow-safe at 100 TB sums), quotient pinned to (18,6).
    * Spark divides at its capped (38,13) intermediate then HALF_UPs to
    * 6; DuckDB divides with its own wider intermediate; both carry ≥7
    * guard digits past the target scale, so the pinned cast agrees.
    * The division itself runs once per GROUP (3 rows) — only the sums
    * feeding it are per-row work, and they run as long limb sums. */
  def dc3(s: SparkSession, dir: String): DataFrame =
    Graft.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        decSumLong(unscaled2dp(col("l_extendedprice")), 2)
          .cast(DecimalType(25, 6)).as("sp"),
        decSumLong(unscaled2dp(col("l_quantity")), 2)
          .cast(DecimalType(25, 6)).as("sq"))
      .select(col("l_returnflag"),
        (col("sp") / col("sq")).cast(DecimalType(18, 6)).cast("double")
          .as("avg_unit_price"),
        col("sq").cast(DecimalType(28, 2)).cast("double").as("sum_qty"))

  val dc3Sql: String =
    """SELECT l_returnflag,
      |  CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(25,6)) /
      |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(25,6))
      |       AS DECIMAL(18,6)) AS DOUBLE) AS avg_unit_price,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dc1_decimal_agg" -> dc1 _,
    "dc2_decimal_product" -> dc2 _,
    "dc3_decimal_division" -> dc3 _)

  val oracle: Map[String, String] = Map(
    "dc1_decimal_agg" -> dc1Sql,
    "dc2_decimal_product" -> dc2Sql,
    "dc3_decimal_division" -> dc3Sql)
}
