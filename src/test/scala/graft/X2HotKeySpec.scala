package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x2's skew bound (VERDICT r20 next-round #3): the market-basket pair
  * emitter must survive a HOT ORDER — a group whose distinct-part
  * count is far past the TPC-H ≤7-line assumption. The r21 emitter
  * streams pairs from (i, j) cursors over the O(k) distinct-part
  * buffer instead of materializing the O(k²) pair set per group; this
  * spec plants a 1,500-distinct-part order (1.1M pairs from one group)
  * plus duplicate lines and repeat-pair orders, and pins the output
  * against the relational DISTINCT-self-join reference (the declared
  * oracle shape). */
class X2HotKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-x2-hotkey-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed pair emitter matches the relational reference on a hot order") {
    val spk = spark
    import spk.implicits._
    val hotK = 1500
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    // hot order 1: parts 1..hotK, each line duplicated (dedupe path)
    for (p <- 1 to hotK; _ <- 1 to 2) rows += ((1L, p.toLong))
    // orders 2..4 share {10, 20, 30}: pairs reach the >=3 threshold
    for (ok <- 2L to 4L; p <- Seq(10L, 20L, 30L)) rows += ((ok, p))
    // order 5: a two-part order below the threshold
    rows += ((5L, 40L)); rows += ((5L, 50L))
    val li = rows.toSeq.toDF("l_orderkey", "l_partkey")

    val got = queries.Analytics.x2From(spark, li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // relational reference = the declared oracle SQL shape
    val d = li.select(col("l_orderkey").as("ok"), col("l_partkey")).distinct()
    val want = d.select(col("ok"), col("l_partkey").as("pa"))
      .join(d.select(col("ok").as("ok2"), col("l_partkey").as("pb")),
        col("ok") === col("ok2") && col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("together"))
      .filter(col("together") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == want)
    // the planted expectation: {10,20,30} pairs appear in orders 2..4
    // AND the hot order -> count 4; every hot-order-only pair is
    // filtered by the >=3 threshold
    assert(got == Set((10L, 20L, 4L), (10L, 30L, 4L), (20L, 30L, 4L)))
  }
}
