package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Graft
import graft.engine.Num.{decSum, decSumLong, unscaledLong}

/** Decimal-first semantics end-to-end (reference: money is
  * DecimalType ≤ 38 digits throughout — `spi/type/Decimals.java:45`,
  * `operator/aggregation/DecimalSumAggregation.java`,
  * `type/DecimalCasts.java`, division-scale rules in
  * `type/DecimalOperators.java`): the testdata measures land as
  * doubles (TESTDATA.md), so these queries FIRST cast them to a
  * decimal-typed shadow schema — lossless for the 2-dp fixture data —
  * and then keep every aggregate, product, and quotient in DecimalType
  * through to decimal-typed OUTPUT columns, which the driver's
  * schema_match verifies against DuckDB's DECIMAL results.
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
  * Output-boundary contract: ALL arithmetic stays decimal (that is
  * the point of the suite), but the FINAL output columns are cast to
  * DOUBLE on both engines. Rationale (round-9 driver gate failure):
  * the gate hashes stringified values, and pyarrow renders a parquet
  * DECIMAL(28,2) as `Decimal('508966.00')` while the DuckDB oracle
  * frame materializes float64 `508966.0` — trailing-zero strings
  * diverge even when values are exactly equal. Every value here is
  * far below 2^52 in scaled units (sums ≈ 10^10), so the final DOUBLE
  * cast is lossless (PropertiesSpec pins the 2^52 round-trip bound);
  * the exactness guarantee is carried by the decimal intermediates.
  */
object Decimals {

  /** lineitem re-typed as the reference's decimal-first schema. */
  private def li(s: SparkSession, dir: String): DataFrame =
    Graft.load(s, dir, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast(DecimalType(12, 2)).as("qty"),
      col("l_extendedprice").cast(DecimalType(12, 2)).as("price"),
      col("l_discount").cast(DecimalType(4, 2)).as("disc"),
      col("l_tax").cast(DecimalType(4, 2)).as("tax"))

  // ------------------------------------------- dc1 decimal sum/min/max
  /** Decimal aggregation with decimal-typed outputs: exact sums (any
    * row order, any partitioning — DecimalSumAggregation semantics)
    * and exact min/max picks. */
  def dc1(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        decSum(col("qty"), 2).cast(DecimalType(28, 2)).cast("double").as("sum_qty"),
        decSum(col("price"), 2).cast(DecimalType(28, 2)).cast("double").as("sum_price"),
        min(col("price")).cast("double").as("min_price"),
        max(col("price")).cast("double").as("max_price"),
        count(lit(1)).as("n"))

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
    * agreeing bit-for-bit — a true-today, unguaranteed invariant). */
  def dc2(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(4, 2))
    val rev = (col("price") * (one - col("disc"))).cast(DecimalType(18, 4))
    // charge's DECIMAL type would be (22,6) — past long-backed 18 — but
    // its unscaled VALUE (revenue-scale-4 units x (1+tax)-scale-2
    // units <= ~1.2e13) fits a long per row, so the product runs in
    // integer space and the sum in limbs.
    val uCharge = unscaledLong(rev) * unscaledLong(one + col("tax"))
    li(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        decSum(rev, 4)
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
        round(decSumLong(uCharge, 6).cast(DecimalType(32, 6)), 2)
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
    * guard digits past the target scale, so the pinned cast agrees. */
  def dc3(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        decSum(col("price"), 2).cast(DecimalType(25, 6)).as("sp"),
        decSum(col("qty"), 2).cast(DecimalType(25, 6)).as("sq"))
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
