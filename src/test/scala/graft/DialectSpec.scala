package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sqlcompat.Dialect

/** Dialect-translation tests: reference-style SQL runs unchanged on
  * this engine after Dialect.translate. */
class DialectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-dialect-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Graft.registerAll(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("function renames, preserving string literals") {
    assert(Dialect.translate("SELECT approx_distinct(x) FROM t") ==
      "SELECT approx_count_distinct(x) FROM t")
    assert(Dialect.translate("SELECT strpos(name, 'strpos(') FROM t") ==
      "SELECT instr(name, 'strpos(') FROM t")
    assert(Dialect.translate("SELECT 'approx_distinct(' || x FROM t") ==
      "SELECT 'approx_distinct(' || x FROM t")
  }

  test("type renames in CAST and typed literals") {
    assert(Dialect.translate("SELECT CAST(x AS VARBINARY), CAST(y AS REAL)") ==
      "SELECT CAST(x AS binary), CAST(y AS float)")
  }

  test("TRY division maps to try_divide") {
    assert(Dialect.translate("SELECT TRY(a / b) FROM t").replaceAll("\\s", "") ==
      "SELECTtry_divide(a,b)FROMt")
  }

  test("translated reference-dialect queries execute correctly") {
    val q1 = Dialect.translate(
      "SELECT approx_distinct(o_custkey) AS ad FROM orders")
    assert(spark.sql(q1).head().getLong(0) > 0)

    val q2 = Dialect.translate(
      "SELECT strpos(c_name, '#') AS p FROM customer WHERE c_custkey = 1")
    assert(spark.sql(q2).head().getInt(0) > 0)

    val q3 = Dialect.translate(
      "SELECT approx_percentile(o_totalprice, 0.5) AS m FROM orders")
    val m = spark.sql(q3).head().getDouble(0)
    assert(m > 0)

    val q4 = Dialect.translate("SELECT TRY(1.0 / 0.0) AS d")
    assert(spark.sql(q4).head().isNullAt(0)) // error-as-null semantics

    val q5 = Dialect.translate(
      "SELECT format_datetime(o_orderdate, 'YYYY-MM-dd') AS f FROM orders WHERE o_orderkey = 1")
    assert(spark.sql(q5).head().getString(0).matches("\\d{4}-\\d{2}-\\d{2}"))
  }
}
