package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference engine's `type/` operator corpora — the per-type
  * arithmetic/comparison/cast contracts in
  * `core/trino-main/src/test/java/io/trino/type/Test*Operators.java`
  * (bigint/integer/smallint/tinyint/double/real) — replayed through
  * `Dialect.translate`. The load-bearing semantics these pin:
  *
  *  - integer ARITHMETIC overflow raises (the reference's
  *    NUMERIC_VALUE_OUT_OF_RANGE via Math.addExact; this engine's
  *    ANSI eval — lowered in plans/GraftResolutionRules) and is NULL
  *    inside TRY();
  *  - integer DIVISION truncates toward zero on the common integral
  *    type, raises "Division by zero", NULL inside TRY; modulus keeps
  *    the dividend's sign and raises on zero;
  *  - double/real → integral casts round HALF-UP (away from zero for
  *    negatives);
  *  - BETWEEN/comparison three-valued logic with NULL operands.
  *
  * Error-message vectors assert this engine's stable fragments for
  * the same error CONDITION the reference pins (its message text is
  * engine-specific). Files testing the reference's block/serializer
  * plumbing (Test*Type.java) are out of scope — docs/CONFORMANCE.md.
  */
class ReferenceTypeOperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var vectorCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-type-operators", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"replayed $vectorCount reference type-operator vectors")
    if (spark != null) spark.stop()
  }

  private def runQ(sql: String): DataFrame =
    spark.sql(graft.sqlcompat.Dialect.translate(sql))

  private def canonVal(v: Any): String = v match {
    case null => "ø"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case f: Float => canonVal(f.toDouble)
    case d: Double if d.isNaN || d.isInfinite => d.toString
    case d: Double =>
      new java.math.BigDecimal(d.toString).stripTrailingZeros.toPlainString
    case n: Number =>
      new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def vLit(expr: String, expected: String): Unit = {
    vectorCount += 1
    val got = runQ(s"SELECT $expr").collect().toSeq
      .map(r => (0 until r.length).map(i => canonVal(r.get(i))).mkString("|"))
    assert(got == Seq(expected),
      s"\nexpr:     $expr\ngot:      $got\nexpected: $expected")
  }

  private def vNull(expr: String): Unit = vLit(expr, "ø")

  private def vErr(expr: String, frag: String): Unit = {
    vectorCount += 1
    val e = intercept[Throwable] { runQ(s"SELECT $expr").collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains(frag)),
      s"\nwrong error for: $expr\ngot: ${msgs(e).mkString(" | ")}")
  }

  // ------------------------------------------------------------------
  test("bigint/integer arithmetic overflow raises; TRY() is NULL (TestBigintOperators.java:485-530, TestIntegerOperators.java)") {
    vLit("BIGINT '9223372036854775806' + 1", "9223372036854775807")
    vErr("BIGINT '9223372036854775807' + BIGINT '1'", "overflow")
    vErr("BIGINT '-9223372036854775808' - BIGINT '1'", "overflow")
    vErr("BIGINT '9223372036854775807' * 2", "overflow")
    vErr("-(BIGINT '-9223372036854775808')", "overflow")
    vNull("try(BIGINT '9223372036854775807' + BIGINT '1')")
    vNull("try(BIGINT '-9223372036854775808' - BIGINT '1')")
    vNull("try(BIGINT '9223372036854775807' * 2)")
    // integer (32-bit) overflow raises too — Spark's legacy mode
    // would wrap to the sign flip the reference calls out
    vErr("INTEGER '2147483647' + INTEGER '1'", "overflow")
    vErr("INTEGER '-2147483648' - INTEGER '1'", "overflow")
    vErr("INTEGER '2147483647' * INTEGER '2'", "overflow")
    vNull("try(INTEGER '2147483647' + INTEGER '1')")
    // non-overflowing arithmetic keeps exact results and types
    vLit("typeof(INTEGER '3' + INTEGER '4')", "integer")
    vLit("typeof(BIGINT '3' + INTEGER '4')", "bigint")
    vLit("37 + 17", "54")
    vLit("37 - 17", "20")
    vLit("37 * 17", "629")
  }

  // ------------------------------------------------------------------
  test("sum(bigint) overflow raises (AbstractTestAggregations overflow contract)") {
    vErr("sum(x) FROM (VALUES BIGINT '9223372036854775807', BIGINT '1') t(x)",
      "overflow")
    vLit("sum(x) FROM (VALUES BIGINT '9223372036854775806', BIGINT '1') t(x)",
      "9223372036854775807")
  }

  // ------------------------------------------------------------------
  test("decimal arithmetic overflow raises (TestDecimalOperators.java overflow rows)") {
    vLit("CAST('99999999999999999999' AS DECIMAL(38,0)) + CAST(1 AS DECIMAL(38,0))",
      "100000000000000000000")
    // engine message for the reference's DECIMAL_OVERFLOW condition
    vErr("CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)) + " +
      "CAST(1 AS DECIMAL(38,0))", "cannot be represented as Decimal")
    vErr("CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)) * " +
      "CAST(10 AS DECIMAL(38,0))", "cannot be represented as Decimal")
    vErr("CAST('-99999999999999999999999999999999999999' AS DECIMAL(38,0)) - " +
      "CAST(1 AS DECIMAL(38,0))", "cannot be represented as Decimal")
    vNull("try(CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)) + " +
      "CAST(1 AS DECIMAL(38,0)))")
    vErr("sum(x) FROM (VALUES CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)), " +
      "CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0))) t(x)",
      "cannot be represented as Decimal")
  }

  // ------------------------------------------------------------------
  test("integer division / modulus (TestBigintOperators.java:152-193, TestIntegerOperators.java)") {
    vLit("37 / 17", "2")
    vLit("-37 / 17", "-2") // truncation toward zero
    vLit("37 / -17", "-2")
    vLit("5 / 2", "2")
    vLit("1 / 2", "0")
    vLit("typeof(37 / 17)", "integer")
    vLit("typeof(BIGINT '37' / 17)", "bigint")
    vErr("37 / 0", "Division by zero")
    vNull("try(37 / 0)")
    vLit("try(5 / 2)", "2")
    vLit("37 % 17", "3")
    vLit("-37 % 17", "-3") // dividend's sign
    vLit("37 % -17", "3")
    // engine message for the same condition: "Remainder by zero"
    vErr("37 % 0", "by zero")
    vNull("try(37 % 0)")
    // the reference's own overflow corner: MIN_VALUE / -1
    vErr("BIGINT '-9223372036854775808' / -1", "overflow")
    vNull("try(BIGINT '-9223372036854775808' / -1)")
    // user-written cast to double opts back into IEEE division
    vLit("CAST(1 AS DOUBLE) / 2", "0.5")
  }

  // ------------------------------------------------------------------
  test("double/real → integral casts round half-up (TestDoubleOperators.java:366-435, TestRealOperators.java)") {
    vLit("cast(37.7E0 as bigint)", "38")
    vLit("cast(-37.7E0 as bigint)", "-38")
    vLit("cast(17.1E0 as bigint)", "17")
    vLit("cast(-17.1E0 as bigint)", "-17")
    vLit("cast(9.2E18 as bigint)", "9200000000000000000")
    vLit("cast(-9.2E18 as bigint)", "-9200000000000000000")
    vLit("cast(2.21E9 as bigint)", "2210000000")
    vLit("cast(17.5E0 as bigint)", "18")
    vLit("cast(-17.5E0 as bigint)", "-18")
    vLit("cast(REAL '37.7' as integer)", "38")
    vLit("cast(REAL '-37.7' as integer)", "-38")
    vLit("cast(REAL '17.5' as integer)", "18")
    vLit("cast(37.7E0 as integer)", "38")
    vLit("cast(37.7E0 as smallint)", "38")
  }

  // ------------------------------------------------------------------
  test("comparisons / BETWEEN three-valued logic (TestBigintOperators.java:194-365)") {
    vLit("BIGINT '37' = BIGINT '37'", "true")
    vLit("BIGINT '37' = BIGINT '17'", "false")
    vLit("BIGINT '37' <> BIGINT '17'", "true")
    vLit("BIGINT '37' < BIGINT '17'", "false")
    vLit("BIGINT '17' <= BIGINT '17'", "true")
    vLit("BIGINT '37' > BIGINT '17'", "true")
    vLit("BIGINT '37' >= BIGINT '37'", "true")
    vLit("BIGINT '37' BETWEEN BIGINT '17' AND BIGINT '37'", "true")
    vLit("BIGINT '37' BETWEEN BIGINT '37' AND BIGINT '17'", "false")
    vNull("CAST(NULL AS BIGINT) BETWEEN 1 AND 2")
    vNull("1 BETWEEN CAST(NULL AS BIGINT) AND 2")
    vLit("0 BETWEEN CAST(NULL AS BIGINT) AND -1", "false") // knowably false
    vLit("BIGINT '37' IS DISTINCT FROM BIGINT '37'", "false")
    vLit("BIGINT '37' IS DISTINCT FROM CAST(NULL AS BIGINT)", "true")
    vLit("CAST(NULL AS BIGINT) IS DISTINCT FROM CAST(NULL AS BIGINT)", "false")
  }

  // ------------------------------------------------------------------
  test("row comparison / IS DISTINCT FROM vectors (TestRowOperators.java:615-755)") {
    vLit("row(1, 'cat') = row(1, 'cat')", "true")
    vLit("row(TRUE, ARRAY[1], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0])) = " +
      "row(TRUE, ARRAY[1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0]))", "false")
    vLit("row(TRUE, ARRAY[1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0])) = " +
      "row(TRUE, ARRAY[1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0]))", "true")
    // NULL fields: undecided comparisons are NULL, decided ones are not
    vNull("row(1, CAST(NULL AS INTEGER)) = row(1, 2)")
    vNull("row(1, CAST(NULL AS INTEGER)) != row(1, 2)")
    vLit("row(2, CAST(NULL AS INTEGER)) = row(1, 2)", "false")
    vLit("row(2, CAST(NULL AS INTEGER)) != row(1, 2)", "true")
    vLit("ROW(1, 2) = ROW(1, 2)", "true")
    vLit("ROW(2, 1) != ROW(1, 2)", "true")
    vLit("ROW(1.0, 123123123456.6549876543) = ROW(1.0, 123123123456.6549876543)", "true")
    vLit("ROW(1.0, 123123123456.6549876543) = ROW(1.0, 123123123456.6549876542)", "false")
    // orderings (assertComparisonCombination pairs, a < b)
    vLit("row(1.0E0, 'kittens') < row(1.0E0, 'puppies')", "true")
    vLit("row(1, 2.0E0) < row(5, 2.0E0)", "true")
    vLit("row(1, 2.0E0) <= row(5, 2.0E0)", "true")
    vLit("row(5, 2.0E0) > row(1, 2.0E0)", "true")
    vLit("row(TRUE, FALSE, TRUE, FALSE) < row(TRUE, TRUE, TRUE, FALSE)", "true")
    vLit("row(1.0E0, ARRAY[1,2,3], row(2, 2.0E0)) < row(1.0E0, ARRAY[1,3,3], row(2, 2.0E0))", "true")
    vLit("row(TRUE, ARRAY[1]) < row(TRUE, ARRAY[1, 2])", "true")
    vLit("ROW(1, 2) < ROW(2, 1)", "true")
    // IS DISTINCT FROM: NULL fields compare as values
    vLit("row(CAST(NULL AS INTEGER)) IS DISTINCT FROM row(CAST(NULL AS INTEGER))", "false")
    vLit("row(1, 'cat') IS DISTINCT FROM row(1, 'cat')", "false")
    vLit("row(1, ARRAY[1]) IS DISTINCT FROM row(1, ARRAY[1])", "false")
    vLit("row(1, ARRAY[1, 2]) IS DISTINCT FROM row(1, ARRAY[1, NULL])", "true")
    vLit("row(1, 2.0E0, TRUE, 'cat', CAST(NULL AS INTEGER)) IS DISTINCT FROM " +
      "row(1, 2.0E0, TRUE, 'cat', 2)", "true")
    vLit("row(1, 2.0E0, TRUE, 'cat', CAST(NULL AS INTEGER)) IS DISTINCT FROM " +
      "row(1, 2.0E0, TRUE, 'cat', CAST(NULL AS INTEGER))", "false")
    vLit("ARRAY[ROW(1)] IS DISTINCT FROM ARRAY[ROW(1)]", "false")
    // map equality / distinct-from is entry-order-insensitive
    // (TestMapOperators testEquals/testDistinctFrom)
    vLit("MAP(ARRAY[1, 3], ARRAY[2, 4]) = MAP(ARRAY[3, 1], ARRAY[4, 2])", "true")
    vLit("MAP(ARRAY[1, 3], ARRAY[2, 4]) = MAP(ARRAY[3, 1], ARRAY[2, 4])", "false")
    vLit("MAP(ARRAY[1, 3], ARRAY['a', 'b']) IS DISTINCT FROM MAP(ARRAY[3, 1], ARRAY['b', 'a'])", "false")
    vLit("MAP(ARRAY[1, 3], ARRAY['a', 'b']) IS DISTINCT FROM MAP(ARRAY[1, 3], ARRAY['a', 'c'])", "true")
    vLit("row(1, MAP(ARRAY[1], ARRAY[2])) IS DISTINCT FROM row(1, MAP(ARRAY[1], ARRAY[2]))", "false")
    vLit("row(1, MAP(ARRAY[1], ARRAY[2])) IS DISTINCT FROM row(1, MAP(ARRAY[1], ARRAY[3]))", "true")
    vLit("CAST(NULL AS MAP(INTEGER, INTEGER)) IS DISTINCT FROM CAST(NULL AS MAP(INTEGER, INTEGER))", "false")
  }

  // ------------------------------------------------------------------
  test("decimal cast vectors (TestDecimalCasts.java:50-700)") {
    // decimal → integral rounds HALF-UP (away from zero)
    vLit("cast(DECIMAL '2.34' as BIGINT)", "2")
    vLit("cast(DECIMAL '2.5' as BIGINT)", "3")
    vLit("cast(DECIMAL '2.49' as BIGINT)", "2")
    vLit("cast(DECIMAL '-2.5' as BIGINT)", "-3")
    vLit("cast(DECIMAL '-2.49' as BIGINT)", "-2")
    vLit("cast(DECIMAL '20' as BIGINT)", "20")
    vLit("cast(DECIMAL '0' as BIGINT)", "0")
    vLit("cast(DECIMAL '2.5' as INTEGER)", "3")
    vLit("cast(DECIMAL '-2.5' as SMALLINT)", "-3")
    // integral → decimal, exact and rescaled
    vLit("cast(BIGINT '20' as DECIMAL(4,1))", "20")
    vLit("cast(20 as DECIMAL(9,2))", "20")
    // decimal → decimal rescale rounds HALF-UP
    vLit("cast(DECIMAL '2.449' as DECIMAL(3,1))", "2.4")
    vLit("cast(DECIMAL '2.45' as DECIMAL(3,1))", "2.5")
    vLit("cast(DECIMAL '-2.45' as DECIMAL(3,1))", "-2.5")
    // out-of-range casts raise (reference INVALID_CAST_ARGUMENT;
    // engine: NUMERIC_VALUE_OUT_OF_RANGE / CAST_OVERFLOW)
    vErr("cast(DECIMAL '99' as DECIMAL(1,0))", "cannot be represented")
    vErr("cast(DECIMAL '123456.5' as SMALLINT)", "cannot be cast")
    vErr("cast(1e19 as BIGINT)", "cannot be cast")
    vErr("cast('bad' as DECIMAL(5,2))", "cannot be cast")
    vNull("try(cast(DECIMAL '99' as DECIMAL(1,0)))")
    vNull("try_cast('bad' as DECIMAL(5,2))")
    // boolean ↔ decimal
    vLit("cast(true as DECIMAL(2,1))", "1")
    vLit("cast(false as DECIMAL(2,1))", "0")
    vLit("cast(DECIMAL '1.1' as BOOLEAN)", "true")
    vLit("cast(DECIMAL '0.0' as BOOLEAN)", "false")
    // varchar ↔ decimal
    vLit("cast('2.34' as DECIMAL(4,2))", "2.34")
    vLit("cast(DECIMAL '2.34' as VARCHAR)", "2.34")
  }

  // ------------------------------------------------------------------
  test("JSON literal / cast-to-JSON vectors (TestJsonOperators.java:100-500)") {
    // JSON 'x' literal → canonical compact text (JSON ↦ VARCHAR)
    vLit("""JSON '{"a" : 1, "b" : [2, 3]}'""", """{"a":1,"b":[2,3]}""")
    vLit("JSON '[1, 2, 3]'", "[1,2,3]")
    vLit("JSON 'null'", "null")
    vLit("JSON '\"128\"'", "\"128\"")
    vErr("JSON 'INVALID'", "Cannot convert value to JSON")
    // casts TO JSON render the SQL value as JSON text
    vLit("CAST(3 AS JSON)", "3")
    vLit("CAST(BIGINT '12345678901' AS JSON)", "12345678901")
    vLit("CAST(true AS JSON)", "true")
    vLit("CAST(1.5E0 AS JSON)", "1.5")
    vLit("CAST('abc' AS JSON)", "\"abc\"")
    vLit("CAST(ARRAY[1, 2, 3] AS JSON)", "[1,2,3]")
    vLit("CAST(MAP(ARRAY['a'], ARRAY[1]) AS JSON)", """{"a":1}""")
    vNull("CAST(NULL AS JSON)")
    vNull("CAST(CAST(NULL AS INTEGER) AS JSON)")
    vLit("CAST(ARRAY[1, NULL, 3] AS JSON)", "[1,null,3]")
    // TRY_CAST keeps the same rendering
    vLit("TRY_CAST('abc' AS JSON)", "\"abc\"")
  }

  // ------------------------------------------------------------------
  test("date operator vectors (TestDate.java:65-570)") {
    vLit("DATE '2001-1-22' = DATE '2001-01-22'", "true")
    vLit("DATE '2001-1-22' < DATE '2001-01-23'", "true")
    vLit("DATE '2001-1-22' BETWEEN DATE '2001-01-01' AND DATE '2001-01-31'", "true")
    vLit("cast(DATE '2001-1-22' as varchar)", "2001-01-22")
    // (the reference also accepts DATE '13-2-2' → 0013-02-02; Spark's
    // parser requires a 4-digit year — documented literal-form gap)
    vLit("cast('2001-1-22' as date)", "2001-01-22")
    vLit("cast('\n\t 2001-1-22' as date)", "2001-01-22")
    vLit("cast('2001-1-22 \t\n' as date)", "2001-01-22")
    vLit("greatest(DATE '2013-03-30', DATE '2012-05-23')", "2013-03-30")
    vLit("least(DATE '2013-03-30', DATE '2012-05-23')", "2012-05-23")
    vLit("DATE '2013-10-27' IS DISTINCT FROM DATE '2013-10-27'", "false")
    vLit("DATE '2013-10-27' IS DISTINCT FROM DATE '2013-10-28'", "true")
    vLit("CAST(NULL AS DATE) IS DISTINCT FROM CAST(NULL AS DATE)", "false")
    vLit("cast(cast(DATE '2001-1-22' as timestamp) as varchar)",
      "2001-01-22 00:00:00")
  }

  // ------------------------------------------------------------------
  test("struct-keyed equi-joins keep hash-join key extraction under the 3VL row-equality lowering") {
    // the field-wise AND chain must remain a conjunction of
    // equi-predicates: ON a.s = b.s extracts per-field join keys —
    // a guard wrapper would demote this to nested-loop at scale
    val a = spark.range(100)
      .selectExpr("named_struct('k1', id % 10, 'k2', id % 7) AS s", "id")
    val b = spark.range(50)
      .selectExpr("named_struct('k1', id % 10, 'k2', id % 7) AS sb")
    val df = a.join(b, a("s") === b("sb"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"struct-key join lost equi-extraction:\n$plan")
    vectorCount += 1
    // every b-row (id 0..49) matches the a-rows sharing (id%10, id%7):
    // the join stays an equi hash/merge join AND returns the 3VL-equal
    // pairs — cardinality cross-checked relationally
    val expected = spark.range(100).selectExpr("id % 10 AS k1", "id % 7 AS k2")
      .join(spark.range(50).selectExpr("id % 10 AS k1", "id % 7 AS k2"),
        Seq("k1", "k2")).count()
    assert(df.count() == expected)
  }

  // ------------------------------------------------------------------
  test("varchar/boolean cast vectors (TestBigintOperators.java:366-460)") {
    vLit("cast(BIGINT '37' as varchar)", "37")
    vLit("cast('37' as bigint)", "37")
    vLit("cast('+37' as bigint)", "37")
    vLit("cast('-37' as bigint)", "-37")
    vLit("cast(BIGINT '37' as boolean)", "true")
    vLit("cast(BIGINT '0' as boolean)", "false")
    vLit("cast(BIGINT '37' as double)", "37")
    vLit("cast(true as integer)", "1")
    vLit("cast(false as integer)", "0")
  }
}
