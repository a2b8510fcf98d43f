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
    // the source fingerprint in the key means regenerated testdata gets
    // fresh tables instead of silently joining a stale bucketed copy
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_") +
      "_" + Graft.srcTag(dir, "orders") + Graft.srcTag(dir, "lineitem")
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

  /** cat2: SQL-defined abstractions end-to-end — a TEMPORARY VIEW
    * (reference `SqlBase.g4:92-98` createView; Spark's
    * `CREATE OR REPLACE TEMPORARY VIEW`) over the orders scan, a CTAS
    * parquet table (createTableAsSelect) materializing a customer
    * segment projection, and a query joining the two. The oracle
    * inlines the view body and the CTAS projection over the raw
    * tables, so the gate proves view resolution and the CTAS
    * round-trip are lossless. Catalyst inlines temp views at analysis
    * time — filters/pruning push through them like any subquery, so a
    * view costs nothing at 100 TB; the CTAS table is a real parquet
    * relation with its own stats. */
  def cat2(s: SparkSession, dir: String): DataFrame = {
    // fingerprint the CTAS source like Pipeline's derived fixtures:
    // regenerated testdata must not hit a stale cust_seg table
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_") +
      "_" + Graft.srcTag(dir, "customer")
    Graft.load(s, dir, "orders").createOrReplaceTempView(s"orders_src_$key")
    s.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW v_big_orders_$key AS
         |SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
         |FROM orders_src_$key WHERE o_totalprice > 150000.0""".stripMargin)
    val seg = s"cust_seg_$key"
    if (!s.catalog.tableExists(seg)) {
      val loc = new java.io.File(s"/tmp/graft_warehouse/$key/cust_seg")
      if (loc.exists()) { // leftover files from a previous session's CTAS
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
      Graft.load(s, dir, "customer").createOrReplaceTempView(s"customer_src_$key")
      s.sql(
        s"""CREATE TABLE $seg USING PARQUET LOCATION '${loc.getAbsolutePath}'
           |AS SELECT c_custkey, c_mktsegment FROM customer_src_$key""".stripMargin)
    }
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  CAST(sum(price) AS DOUBLE) AS big_revenue
         |FROM v_big_orders_$key v JOIN $seg c ON v.o_custkey = c.c_custkey
         |GROUP BY c_mktsegment""".stripMargin)
  }

  val cat2Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS big_revenue
      |FROM (SELECT o_custkey, o_totalprice FROM orders
      |      WHERE o_totalprice > 150000.0) v
      |JOIN customer c ON v.o_custkey = c.c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** cat3: MATERIALIZED VIEW lifecycle under the gate (reference
    * `SqlBase.g4:92-98`, `ConnectorMetadata.getMaterializedViewFreshness`):
    * yearly revenue by order priority materialized to a storage table
    * keyed by source fingerprints. Grace period 0 here: a fresh MV
    * serves the storage table (plain parquet scan), a stale one is
    * refreshed first then served — so the oracle hash holds whether or
    * not the testdata was regenerated since materialization, and
    * recompute happens once per source change, not once per read.
    * MaterializedViewSpec drives the full stale→grace→refresh cycle. */
  def cat3(s: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val storage = s"/tmp/graft_warehouse/mv_rev_$key"
    def defining(): DataFrame =
      Graft.load(s, dir, "lineitem")
        .join(Graft.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("n_items"),
          sum(Num.revenue(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
    // refresh-on-stale: source regeneration (or a fingerprint-format
    // change) re-materializes ONCE; steady-state reads stay a plain
    // parquet scan of the storage table
    graft.operators.MaterializedView.readRefreshing(s, storage, () => defining(),
      Seq(dir -> "orders", dir -> "lineitem"), gracePeriodMs = 0L)
  }

  val cat3Sql: String =
    """SELECT o_orderpriority, year(o_orderdate) AS o_year, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority, year(o_orderdate)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cat1_colocated_join" -> cat1 _,
    "cat2_view_ctas" -> cat2 _,
    "cat3_materialized_view" -> cat3 _)

  val oracle: Map[String, String] = Map(
    "cat1_colocated_join" -> cat1Sql,
    "cat2_view_ctas" -> cat2Sql,
    "cat3_materialized_view" -> cat3Sql)
}
