package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Graft
import graft.sqlcompat.Dialect

/** The dialect-translation layer under the correctness gate: a query
  * written in the REFERENCE engine's SQL dialect (three-arg date_add/
  * date_diff with unit literals, strpos, TRY(), bitwise_* functions)
  * is mechanically translated by `sqlcompat/Dialect` and executed on
  * this engine, then hash-matched against the oracle's native
  * formulation — proving a reference user's existing SQL runs
  * unchanged AND returns identical values, including the
  * type-preserving DATE arithmetic (ship_by stays a DATE through
  * graft_date_add). */
object DialectQueries {

  /** The reference-dialect text, exactly as a witdb/Trino user would
    * write it. */
  val dx1Reference: String =
    """SELECT o_orderkey,
      |  date_add('day', 3, CAST(o_orderdate AS DATE)) AS ship_by,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_left,
      |  strpos(o_orderpriority, '-') AS dash_pos,
      |  TRY(o_totalprice / (o_orderkey % 5)) AS ratio,
      |  bitwise_and(o_orderkey, 255) AS low_bits
      |FROM orders WHERE o_orderkey <= 2000""".stripMargin

  def dx1(s: SparkSession, dir: String): DataFrame = {
    Graft.registerAll(s, dir)
    s.sql(Dialect.translate(dx1Reference))
  }

  val dx1Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) + INTERVAL 3 DAY AS ship_by,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_left,
      |  CAST(strpos(o_orderpriority, '-') AS INTEGER) AS dash_pos,
      |  CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |       ELSE o_totalprice / (o_orderkey % 5) END AS ratio,
      |  o_orderkey & 255 AS low_bits
      |FROM orders WHERE o_orderkey <= 2000""".stripMargin

  /** Quantified comparison predicates in the reference dialect:
    * `= ANY (subquery)` and `<> ALL (subquery)` — the two forms
    * SQL:2016 §8.8 defines as IN / NOT IN, which is exactly how the
    * dialect layer rewrites them for Spark (null and empty-subquery
    * semantics identical BY DEFINITION, not approximation). The
    * oracle runs the ORIGINAL quantified syntax natively in DuckDB,
    * so the rewrite is proven against a real implementation of the
    * standard. Customers whose balance equals some balance in a
    * high-value nation, minus those whose segment differs from all
    * BUILDING-nation segments. */
  val dx2Reference: String =
    """SELECT c_mktsegment, count(*) AS n_matched
      |FROM customer
      |WHERE c_acctbal = ANY (
      |    SELECT c2.c_acctbal FROM customer c2 WHERE c2.c_nationkey < 5)
      |  AND c_nationkey <> ALL (
      |    SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%')
      |GROUP BY c_mktsegment""".stripMargin

  def dx2(s: SparkSession, dir: String): DataFrame = {
    Graft.registerAll(s, dir)
    s.sql(Dialect.translate(dx2Reference))
  }

  val dx2Sql: String =
    """SELECT c_mktsegment, count(*) AS n_matched
      |FROM customer
      |WHERE c_acctbal = ANY (
      |    SELECT c2.c_acctbal FROM customer c2 WHERE c2.c_nationkey < 5)
      |  AND c_nationkey <> ALL (
      |    SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%')
      |GROUP BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dx1_reference_dialect" -> dx1 _,
    "dx2_quantified_cmp" -> dx2 _)

  val oracle: Map[String, String] = Map(
    "dx1_reference_dialect" -> dx1Sql,
    "dx2_quantified_cmp" -> dx2Sql)
}
