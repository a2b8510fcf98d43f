package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Graft, Num}

/** Catalog-table surface: bucketed, sort-ordered managed tables and the
  * co-located joins they enable (reference: witdb/Trino's bucketed hive
  * tables + `SELECT ... FROM bucketed_a JOIN bucketed_b` grouped
  * execution, `plugin/trino-hive/.../BackgroundHiveSplitLoader.java`
  * bucket handling; Spark-side this is `bucketBy().sortBy().
  * saveAsTable` + Catalyst's `EnsureRequirements` recognizing both
  * sides' HashPartitioning(bucket key)).
  *
  * THE 100 TB point of bucketing: the fact-fact join (lineitem ⋈
  * orders on orderkey) is the single largest shuffle in the TPC-H-ish
  * workload — at 100 TB it moves the whole fact table across the
  * network every query. Writing both tables bucketed by the join key
  * amortizes that shuffle ONCE at load time; every subsequent join
  * plans as a zero-exchange sort-merge join per bucket pair
  * (ScaleSpec holds the plan proof: no Exchange above either scan).
  * The same layout serves aggregation on the bucket key and is the
  * natural unit for cluster-wide data placement.
  */
object CatalogOps {

  /** Create (once per sf dir + session) bucketed managed tables for
    * orders/lineitem, bucketed AND sorted by the join key. Idempotent:
    * keyed by the sf dir, reused across the bench's repeated runs. */
  private def ensureBucketed(s: SparkSession, dir: String): (String, String) = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val oTab = s"orders_bkt_$key"
    val lTab = s"lineitem_bkt_$key"
    val base = s"/tmp/graft_warehouse/$key"
    if (!s.catalog.tableExists(oTab)) {
      Graft.load(s, dir, "orders").write.mode("overwrite")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(oTab)
      s.sql(s"ANALYZE TABLE $oTab COMPUTE STATISTICS")
    }
    if (!s.catalog.tableExists(lTab)) {
      Graft.load(s, dir, "lineitem").write.mode("overwrite")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(lTab)
      s.sql(s"ANALYZE TABLE $lTab COMPUTE STATISTICS")
    }
    (oTab, lTab)
  }

  /** cat1: the fact-fact join executed over the co-located layout —
    * revenue by order priority. Result is oracle-identical to the same
    * join over the raw parquet (the bucketed tables hold the same
    * rows), so the gate also proves the bucketed write is lossless. */
  def cat1(s: SparkSession, dir: String): DataFrame = {
    val (oTab, lTab) = ensureBucketed(s, dir)
    s.table(lTab)
      .join(s.table(oTab), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(Num.revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
  }

  val cat1Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cat1_colocated_join" -> cat1 _)

  val oracle: Map[String, String] = Map(
    "cat1_colocated_join" -> cat1Sql)
}
