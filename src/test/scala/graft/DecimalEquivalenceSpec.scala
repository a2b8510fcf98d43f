package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Graft
import graft.engine.Num.{decSum, decSumLong, unscaledLong}

/** r21 decimal-kernel lowering (VERDICT r20 next-round #4): dc1/dc2/dc3
  * moved their per-row work from decimal space (a BigDecimal allocation
  * per `cast(double AS DECIMAL(12,2))`, decimal-typed min/max buffers,
  * a per-row Decimal multiply in dc2) to unscaled-long space. The
  * oracle hash gate pins the lowered queries against DuckDB at both
  * SFs; THIS spec pins them against their own r20 decimal-space shapes
  * (reproduced inline below, verbatim), row for row and bit for bit —
  * so the equivalence claim is tested engine-internally too, on the
  * exact Spark cast/rounding semantics the proof in
  * [[graft.engine.Num.unscaled2dp]] appeals to. */
class DecimalEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-dec-eq-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- the r20 decimal-space shapes, verbatim ----------------------
  private def liDec(s: SparkSession, dir: String): DataFrame =
    Graft.load(s, dir, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast(DecimalType(12, 2)).as("qty"),
      col("l_extendedprice").cast(DecimalType(12, 2)).as("price"),
      col("l_discount").cast(DecimalType(4, 2)).as("disc"),
      col("l_tax").cast(DecimalType(4, 2)).as("tax"))

  private def dc1Old(s: SparkSession, dir: String): DataFrame =
    liDec(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        decSum(col("qty"), 2).cast(DecimalType(28, 2)).cast("double").as("sum_qty"),
        decSum(col("price"), 2).cast(DecimalType(28, 2)).cast("double").as("sum_price"),
        min(col("price")).cast("double").as("min_price"),
        max(col("price")).cast("double").as("max_price"),
        count(lit(1)).as("n"))

  private def dc2Old(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(4, 2))
    val rev = (col("price") * (one - col("disc"))).cast(DecimalType(18, 4))
    val uCharge = unscaledLong(rev) * unscaledLong(one + col("tax"))
    liDec(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        decSum(rev, 4)
          .cast(DecimalType(28, 4)).cast("double").as("revenue"),
        round(decSumLong(uCharge, 6).cast(DecimalType(32, 6)), 2)
          .cast(DecimalType(28, 2)).cast("double").as("charge"))
  }

  private def dc3Old(s: SparkSession, dir: String): DataFrame =
    liDec(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        decSum(col("price"), 2).cast(DecimalType(25, 6)).as("sp"),
        decSum(col("qty"), 2).cast(DecimalType(25, 6)).as("sq"))
      .select(col("l_returnflag"),
        (col("sp") / col("sq")).cast(DecimalType(18, 6)).cast("double")
          .as("avg_unit_price"),
        col("sq").cast(DecimalType(28, 2)).cast("double").as("sum_qty"))

  // ---- bit-exact comparison (doubles via raw bits, no tolerance) ----
  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToRawLongBits(d)
      case x => x
    }).sortBy(_.mkString("|"))

  private def assertIdentical(now: DataFrame, old: DataFrame): Unit = {
    assert(now.schema == old.schema, "schemas must match")
    assert(canon(now) == canon(old), "lowered shape must be bit-identical")
  }

  test("dc1 unscaled-long shape is bit-identical to the decimal shape") {
    assertIdentical(queries.Decimals.dc1(spark, sfDir), dc1Old(spark, sfDir))
  }

  test("dc2 unscaled-long shape is bit-identical to the decimal shape") {
    assertIdentical(queries.Decimals.dc2(spark, sfDir), dc2Old(spark, sfDir))
  }

  test("dc3 unscaled-long shape is bit-identical to the decimal shape") {
    assertIdentical(queries.Decimals.dc3(spark, sfDir), dc3Old(spark, sfDir))
  }

  test("dc plans carry no per-row double->decimal cast and stay codegen'd") {
    for ((name, fn) <- queries.Decimals.queries) {
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val plan = df.queryExecution.executedPlan.toString
      // the per-row decimal casts of the r20 shape are gone …
      assert(!plan.contains("as decimal(12,2)"),
        s"$name still casts a measure column to decimal per row:\n${plan.take(1500)}")
      // … and the aggregate runs inside a whole-stage-codegen span
      // (long limb sums are codegen-able; a decimal/imperative buffer
      // would fall out of the span)
      assert(plan.contains("*(") && plan.contains("HashAggregate"),
        s"$name aggregate left whole-stage codegen:\n${plan.take(1500)}")
    }
  }
}
