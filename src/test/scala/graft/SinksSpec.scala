package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Writer-sink coverage (SURVEY §2.1: TableWriterOperator →
  * df.write.*; other formats orc/csv/json — reference `lib/trino-orc`,
  * `lib/trino-hive-formats`) and the ANALYZE/stats surface (§2.8:
  * SHOW STATS → ANALYZE TABLE COMPUTE STATISTICS feeding Catalyst
  * `Statistics`). */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-sink-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Files.createTempDirectory("graft_sinks").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("write/read round-trip across parquet, orc, json, csv") {
    val src = graft.engine.Graft.load(spark, sfDir, "customer")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$tmp/rt_$fmt"
      src.write.format(fmt).option("header", "true").mode("overwrite").save(path)
      val back = spark.read.format(fmt)
        .option("header", "true").schema(src.schema).load(path)
      assert(back.count() == src.count(), s"$fmt count")
      assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty,
        s"$fmt content mismatch")
    }
  }

  test("partitioned write prunes partitions on read") {
    val src = graft.engine.Graft.load(spark, sfDir, "orders")
    val path = s"$tmp/part_orders"
    src.withColumn("prio", org.apache.spark.sql.functions.col("o_orderpriority"))
      .write.partitionBy("prio").mode("overwrite").parquet(path)
    val pruned = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("prio") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(prio"), plan.take(1500))
    assert(pruned.count() ==
      src.filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT").count())
  }

  test("ANALYZE TABLE feeds Catalyst statistics (row count + column stats)") {
    graft.engine.Graft.load(spark, sfDir, "customer").createOrReplaceTempView("cust_src")
    spark.sql("DROP TABLE IF EXISTS cust_tab")
    spark.sql(
      s"CREATE TABLE cust_tab USING parquet LOCATION '$tmp/cust_tab' AS SELECT * FROM cust_src")
    spark.sql("ANALYZE TABLE cust_tab COMPUTE STATISTICS FOR ALL COLUMNS")
    // catalog row/column stats reach plan Statistics only under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val stats = spark.table("cust_tab").queryExecution.optimizedPlan.stats
    spark.conf.set("spark.sql.cbo.enabled", "false")
    assert(stats.rowCount.exists(_.longValue == 150), s"rowCount=${stats.rowCount}")
    assert(stats.attributeStats.nonEmpty, "expected column-level stats")
    val distinctKeys = stats.attributeStats.collectFirst {
      case (a, s) if a.name == "c_custkey" => s.distinctCount.get.longValue
    }
    assert(distinctKeys.contains(150L), s"c_custkey ndv=$distinctKeys")
  }
}
