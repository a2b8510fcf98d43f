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
    // 1-5-digit years canonicalize at translate time (TestDate.java:
    // DATE '13-2-2' → 0013-02-02, zero-padded '02013' → 2013,
    // surrounding whitespace trimmed, invalid calendar dates raise)
    vLit("cast(DATE '13-2-2' as varchar)", "0013-02-02")
    vLit("cast(DATE '0013-02-02' as varchar)", "0013-02-02")
    vLit("cast(DATE '02013-02-02' as varchar)", "2013-02-02")
    vLit("cast(DATE '  2013-02-02  ' as varchar)", "2013-02-02")
    vLit("DATE '13-2-2' < DATE '2001-1-22'", "true")
    vErr("DATE '2013-02-29'", "not a valid date literal")
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

  // ------------------------------------------------------------------
  test("varchar operator contract (TestVarcharOperators.java)") {
    // literals / typed constructor (varchar lengths erase to STRING —
    // SURVEY §1.3 documented mapping; values are exact)
    vLit("'foo'", "foo")
    vLit("''", "")
    vLit("VARCHAR 'foo'", "foo")
    vLit("VARCHAR ''", "")
    // concatenation
    vLit("'foo' || 'foo'", "foofoo")
    vLit("'foo' || 'bar'", "foobar")
    vLit("'bar' || 'barbaz'", "barbarbaz")
    // comparisons
    vLit("'foo' = 'foo'", "true")
    vLit("'foo' = 'bar'", "false")
    vLit("'foo' <> 'foo'", "false")
    vLit("'bar' <> 'foo'", "true")
    vLit("'foo' < 'foo'", "false")
    vLit("'bar' < 'foo'", "true")
    vLit("'foo' < 'bar'", "false")
    vLit("'foo' <= 'foo'", "true")
    vLit("'foo' <= 'bar'", "false")
    vLit("'bar' <= 'foo'", "true")
    vLit("'foo' > 'bar'", "true")
    vLit("'bar' > 'foo'", "false")
    vLit("'foo' >= 'foo'", "true")
    vLit("'bar' >= 'foo'", "false")
    // BETWEEN (all 8 foo/bar corners)
    vLit("'foo' BETWEEN 'foo' AND 'foo'", "true")
    vLit("'foo' BETWEEN 'foo' AND 'bar'", "false")
    vLit("'foo' BETWEEN 'bar' AND 'foo'", "true")
    vLit("'foo' BETWEEN 'bar' AND 'bar'", "false")
    vLit("'bar' BETWEEN 'foo' AND 'foo'", "false")
    vLit("'bar' BETWEEN 'foo' AND 'bar'", "false")
    vLit("'bar' BETWEEN 'bar' AND 'foo'", "true")
    vLit("'bar' BETWEEN 'bar' AND 'bar'", "true")
    // IS DISTINCT FROM
    vLit("CAST(NULL AS VARCHAR) IS DISTINCT FROM CAST(NULL AS VARCHAR)", "false")
    vLit("'foo' IS DISTINCT FROM 'foo'", "false")
    vLit("'foo' IS DISTINCT FROM 'fo0'", "true")
    vLit("NULL IS DISTINCT FROM 'foo'", "true")
    vLit("'foo' IS DISTINCT FROM NULL", "true")
    // INDETERMINATE operator ≡ value IS NULL
    vLit("cast(null as varchar) IS NULL", "true")
    vLit("'foo' IS NULL", "false")
    vLit("cast(123456 as varchar) IS NULL", "false")
    vLit("cast(12345.0123 as varchar) IS NULL", "false")
    vLit("cast(true as varchar) IS NULL", "false")
  }

  // ------------------------------------------------------------------
  test("char operator contract — PAD SPACE comparison (TestCharOperators.java)") {
    // equality pads to the common length (SQL PAD SPACE): declared
    // lengths differ, trailing spaces insignificant
    vLit("cast('foo' as char(3)) = cast('foo' as char(5))", "true")
    vLit("cast('foo' as char(3)) = cast('foo' as char(3))", "true")
    vLit("cast('foo' as char(3)) = cast('bar' as char(3))", "false")
    vLit("cast('bar' as char(5)) = 'bar'", "true")
    vLit("cast('bar' as char(5)) = 'bar   '", "true")
    vLit("cast('a' as char(2)) = cast('a ' as char(2))", "true")
    vLit("cast('a ' as char(2)) = cast('a' as char(2))", "true")
    vLit("cast('a' as char(3)) = cast('a' as char(2))", "true")
    vLit("cast('' as char(3)) = cast('' as char(2))", "true")
    vLit("cast('foo' as char(3)) <> cast('foo' as char(5))", "false")
    vLit("cast('foo' as char(3)) <> cast('bar' as char(3))", "true")
    vLit("cast('bar' as char(5)) <> 'bar   '", "false")
    vLit("cast('' as char(3)) <> cast('' as char(2))", "false")
    // ordering: '\0' sorts below the implicit pad space
    vLit("cast('\u0000' as char(1)) < cast(' ' as char(1))", "true")
    vLit("cast('bar' as char(5)) < cast('foo' as char(3))", "true")
    vLit("cast('foo' as char(5)) < cast('bar' as char(3))", "false")
    vLit("cast('foo' as char(3)) < cast('foo' as char(5))", "false")
    vLit("cast('foobar' as char(6)) < cast('foobaz' as char(6))", "true")
    vLit("cast('foob r' as char(6)) < cast('foobar' as char(6))", "true")
    vLit("cast('\u0000' as char(1)) < cast('' as char(0))", "true")
    vLit("cast('abc\u0000' as char(4)) < cast('abc' as char(4))", "true")
    vLit("cast('\u0000' as char(1)) < cast('\u0000 ' as char(2))", "false")
    vLit("cast('\u0000' as char(2)) < cast('\u0000 ' as char(2))", "false")
    vLit("cast('\u0000 a' as char(3)) < cast('\u0000' as char(3))", "false")
    vLit("cast('bar' as char(5)) <= cast('foo' as char(3))", "true")
    vLit("cast('foo' as char(3)) <= cast('foo' as char(5))", "true")
    vLit("cast('foo' as char(5)) <= cast('foo' as char(3))", "true")
    vLit("cast('\u0000' as char(1)) <= cast('\u0000 ' as char(2))", "true")
    vLit("cast('\u0000 a' as char(3)) <= cast('\u0000' as char(3))", "false")
    vLit("cast('foo' as char(5)) > cast('bar' as char(3))", "true")
    vLit("cast('foo' as char(3)) > cast('foo' as char(5))", "false")
    vLit("cast(' ' as char(1)) > cast('\u0000' as char(1))", "true")
    vLit("cast('' as char(0)) > cast('\u0000' as char(1))", "true")
    vLit("cast('abc' as char(4)) > cast('abc\u0000' as char(4))", "true")
    vLit("cast('\u0000 ' as char(2)) > cast('\u0000' as char(1))", "false")
    vLit("cast('\u0000 ' as char(2)) > cast('\u0000' as char(2))", "false")
    vLit("cast('\u0000 a' as char(3)) > cast('\u0000' as char(3))", "true")
    vLit("cast('foo' as char(3)) >= cast('foo' as char(5))", "true")
    vLit("cast('\u0000 ' as char(2)) >= cast('\u0000' as char(1))", "true")
    vLit("cast('\u0000 a' as char(3)) >= cast('\u0000' as char(3))", "true")
    // BETWEEN under PAD SPACE (incl. the length-based rows)
    vLit("cast('bbb' as char(3)) BETWEEN cast('aaa' as char(3)) AND cast('ccc' as char(3))", "true")
    vLit("cast('foo' as char(3)) BETWEEN cast('foo' as char(3)) AND cast('foo' as char(3))", "true")
    vLit("cast('foo' as char(3)) BETWEEN cast('foo' as char(3)) AND cast('bar' as char(3))", "false")
    vLit("cast('foo' as char(3)) BETWEEN cast('zzz' as char(3)) AND cast('foo' as char(3))", "false")
    vLit("cast('foo' as char(3)) NOT BETWEEN cast('zzz' as char(3)) AND cast('foo' as char(3))", "true")
    vLit("cast('foo' as char(3)) BETWEEN cast('bar' as char(3)) AND cast('foo' as char(3))", "true")
    vLit("cast('bar' as char(3)) BETWEEN cast('foo' as char(3)) AND cast('bar' as char(3))", "false")
    vLit("cast('bar' as char(3)) BETWEEN cast('bar' as char(3)) AND cast('foo' as char(3))", "true")
    vLit("cast('\u0000 a' as char(3)) BETWEEN cast('\u0000' as char(3)) AND cast('\u0000a' as char(3))", "true")
    vLit("cast('bar' as char(4)) BETWEEN cast('bar' as char(3)) AND cast('bar' as char(5))", "true")
    vLit("cast('bar' as char(4)) BETWEEN cast('bar' as char(5)) AND cast('bar' as char(7))", "true")
    // IS DISTINCT FROM
    vLit("cast(NULL as char(3)) IS DISTINCT FROM cast(NULL as char(5))", "false")
    vLit("cast('foo' as char(3)) IS DISTINCT FROM cast('foo' as char(5))", "false")
    vLit("cast('foo' as char(3)) IS DISTINCT FROM cast('bar' as char(3))", "true")
    vLit("cast('foo' as char(3)) IS DISTINCT FROM NULL", "true")
    vLit("cast('bar' as char(5)) IS DISTINCT FROM 'bar'", "false")
    vLit("cast('bar' as char(5)) IS DISTINCT FROM 'bar   '", "false")
    vLit("NULL IS DISTINCT FROM cast('foo' as char(3))", "true")
    // INDETERMINATE ≡ IS NULL; CHAR typed literal
    vLit("CAST(null AS CHAR(3)) IS NULL", "true")
    vLit("CHAR '123' IS NULL", "false")
    vLit("CHAR '123'", "123")
  }

  // ------------------------------------------------------------------
  test("boolean operator contract (TestBooleanOperators.java)") {
    vLit("true", "true")
    vLit("false", "false")
    vLit("BOOLEAN 'true'", "true")
    vLit("BOOLEAN 'false'", "false")
    vLit("true = true", "true")
    vLit("true = false", "false")
    vLit("false = false", "true")
    vLit("true <> true", "false")
    vLit("true <> false", "true")
    // booleans order false < true
    vLit("true < true", "false")
    vLit("true < false", "false")
    vLit("false < true", "true")
    vLit("true <= false", "false")
    vLit("false <= true", "true")
    vLit("false <= false", "true")
    vLit("true > false", "true")
    vLit("false > true", "false")
    vLit("true >= true", "true")
    vLit("false >= true", "false")
    vLit("true BETWEEN true AND true", "true")
    vLit("true BETWEEN true AND false", "false")
    vLit("true BETWEEN false AND true", "true")
    vLit("false BETWEEN true AND true", "false")
    vLit("false BETWEEN false AND true", "true")
    vLit("false BETWEEN false AND false", "true")
    // casts
    vLit("cast(true as real)", "1")
    vLit("cast(false as real)", "0")
    vLit("cast(true as varchar)", "true")
    vLit("cast(false as varchar)", "false")
    vLit("cast('true' as boolean)", "true")
    vLit("cast('false' as boolean)", "false")
    // IS DISTINCT FROM
    vLit("CAST(NULL AS BOOLEAN) IS DISTINCT FROM CAST(NULL AS BOOLEAN)", "false")
    vLit("FALSE IS DISTINCT FROM FALSE", "false")
    vLit("TRUE IS DISTINCT FROM TRUE", "false")
    vLit("FALSE IS DISTINCT FROM TRUE", "true")
    vLit("FALSE IS DISTINCT FROM NULL", "true")
    vLit("TRUE IS DISTINCT FROM NULL", "true")
    // INDETERMINATE ≡ IS NULL
    vLit("cast(null AS BOOLEAN) IS NULL", "true")
    vLit("(true AND false) IS NULL", "false")
    vLit("(true OR false) IS NULL", "false")
  }

  // ------------------------------------------------------------------
  test("unknown (NULL-typed) operator contract (TestUnknownOperators.java)") {
    // every comparison on the unknown type is NULL (3VL); the
    // reference's null_function() is replayed as nullif(1, 1)
    vNull("NULL = NULL")
    vNull("NULL <> NULL")
    vNull("NULL < NULL")
    vNull("NULL <= NULL")
    vNull("NULL > NULL")
    vNull("NULL >= NULL")
    vNull("NULL BETWEEN NULL AND NULL")
    // casts from unknown are typed NULLs
    vNull("cast(NULL as bigint)")
    vNull("cast(nullif(1, 1) as bigint)")
    vNull("cast(NULL as varchar)")
    vNull("cast(nullif(1, 1) as varchar)")
    vNull("cast(NULL as double)")
    vNull("cast(nullif(1, 1) as double)")
    vNull("cast(NULL as boolean)")
    vNull("cast(nullif(1, 1) as boolean)")
    vLit("typeof(cast(NULL as bigint))", "bigint")
    vLit("typeof(cast(NULL as varchar))", "varchar")
    // IS DISTINCT FROM / INDETERMINATE on unknown
    vLit("NULL IS DISTINCT FROM NULL", "false")
    vLit("NULL IS NULL", "true")
  }

  // ------------------------------------------------------------------
  test("decimal→decimal rescale ladder (TestDecimalToDecimalCasts.java)") {
    // rescale renders the TARGET scale exactly (varchar cast pins it)
    vLit("cast(cast(DECIMAL '0' as DECIMAL(3,2)) as varchar)", "0.00")
    vLit("cast(cast(DECIMAL '2' as DECIMAL(1,0)) as varchar)", "2")
    vLit("cast(cast(DECIMAL '-2' as DECIMAL(1,0)) as varchar)", "-2")
    vLit("cast(cast(DECIMAL '2.0' as DECIMAL(2,1)) as varchar)", "2.0")
    vLit("cast(cast(DECIMAL '2.0' as DECIMAL(2,0)) as varchar)", "2")
    vLit("cast(cast(DECIMAL '-2.0' as DECIMAL(2,0)) as varchar)", "-2")
    vLit("cast(cast(DECIMAL '2.0' as DECIMAL(3,2)) as varchar)", "2.00")
    vLit("cast(cast(DECIMAL '-2.0' as DECIMAL(3,2)) as varchar)", "-2.00")
    vLit("typeof(cast(DECIMAL '2.0' as DECIMAL(3,2)))", "decimal(3,2)")
    // rescale rounds HALF-UP at the dropped digit (both signs)
    vLit("cast(DECIMAL '1.449' as DECIMAL(2,1))", "1.4")
    vLit("cast(DECIMAL '1.459' as DECIMAL(2,1))", "1.5")
    vLit("cast(DECIMAL '-1.449' as DECIMAL(2,1))", "-1.4")
    vLit("cast(DECIMAL '-1.459' as DECIMAL(2,1))", "-1.5")
    // short → long (beyond 18 digits) and back
    vLit("cast(cast(DECIMAL '1.2345' as DECIMAL(21,20)) as varchar)",
      "1.23450000000000000000")
    vLit("cast(cast(DECIMAL '-1.2345' as DECIMAL(21,20)) as varchar)",
      "-1.23450000000000000000")
    vLit("cast(DECIMAL '1.23450000000000000000' as DECIMAL(5,4))", "1.2345")
    vLit("cast(DECIMAL '-1.23450000000000000000' as DECIMAL(5,4))", "-1.2345")
    // long → long, scale widened / narrowed
    vLit("cast(cast(DECIMAL '2.00000000000000000000' as DECIMAL(22,21)) as varchar)",
      "2.000000000000000000000")
    vLit("cast(cast(DECIMAL '2.00000000000000000000' as DECIMAL(20,19)) as varchar)",
      "2.0000000000000000000")
    vLit("cast(cast(DECIMAL '-2.00000000000000000000' as DECIMAL(20,19)) as varchar)",
      "-2.0000000000000000000")
    // HALF-UP at the 20th fractional digit (the 128-bit path)
    vLit("cast(cast(DECIMAL '1.000000000000000000004' as DECIMAL(21,20)) as varchar)",
      "1.00000000000000000000")
    vLit("cast(cast(DECIMAL '1.000000000000000000005' as DECIMAL(21,20)) as varchar)",
      "1.00000000000000000001")
    vLit("cast(cast(DECIMAL '-1.000000000000000000004' as DECIMAL(21,20)) as varchar)",
      "-1.00000000000000000000")
    vLit("cast(cast(DECIMAL '-1.000000000000000000005' as DECIMAL(21,20)) as varchar)",
      "-1.00000000000000000001")
    // out-of-range rescales raise (reference INVALID_CAST_ARGUMENT);
    // NULL under TRY
    vErr("cast(DECIMAL '12345.6' as DECIMAL(4,0))", "cannot be represented")
    vErr("cast(DECIMAL '-12345.6' as DECIMAL(4,0))", "cannot be represented")
    vErr("cast(DECIMAL '12345.6' as DECIMAL(4,2))", "cannot be represented")
    vErr("cast(DECIMAL '-12345.6' as DECIMAL(4,2))", "cannot be represented")
    vErr("cast(DECIMAL '1234500000000000000000000.6' as DECIMAL(20,0))",
      "cannot be represented")
    vErr("cast(DECIMAL '-1234500000000000000000000.6' as DECIMAL(22,2))",
      "cannot be represented")
    vNull("try(cast(DECIMAL '12345.6' as DECIMAL(4,0)))")
    vNull("try(cast(DECIMAL '1234500000000000000000000.6' as DECIMAL(20,0)))")
  }

  // ------------------------------------------------------------------
  test("common super type selection — UNION/CASE/IN (TestTypeCoercion.java SQL-visible slice)") {
    // the reference's TypeCoercion lattice, observed through the only
    // SQL-visible surface this engine has: the type a VALUES union /
    // CASE / IN coerces mixed operands to
    def sup(values: String, expected: String): Unit =
      vLit(s"DISTINCT typeof(x) FROM (VALUES $values) t(x)", expected)
    sup("BIGINT '1', BIGINT '2'", "bigint")
    sup("NULL, BIGINT '1'", "bigint") // unknown ⊔ bigint = bigint
    sup("BIGINT '1', DOUBLE '2.5'", "double")
    // REAL absorbs every integral type (reference rows 151-154)
    sup("REAL '1', TINYINT '2'", "real")
    sup("REAL '1', SMALLINT '2'", "real")
    sup("REAL '1', INTEGER '2'", "real")
    sup("REAL '1', BIGINT '2'", "real")
    sup("REAL '1', DOUBLE '2'", "double")
    // integral ladder
    sup("TINYINT '1', SMALLINT '2'", "smallint")
    sup("SMALLINT '1', INTEGER '2'", "integer")
    sup("INTEGER '1', BIGINT '2'", "bigint")
    // decimal ⊔ integer widens to fit both (reference decimal(11,1))
    sup("DECIMAL '2.2', INTEGER '1'", "decimal(11,1)")
    sup("DECIMAL '2.2', DOUBLE '1'", "double")
    // documented divergence (docs/MIGRATION.md): decimal ⊔ bigint is
    // decimal(21,1) here (Spark reserves 20 integral digits for
    // bigint) vs the reference's decimal(20,1) — value-identical
    sup("DECIMAL '2.2', BIGINT '1'", "decimal(21,1)")
    // date ⊔ timestamp = timestamp (engine maps TIMESTAMP literals to
    // micros instant type — SURVEY §1.3)
    sup("DATE '2001-01-22', TIMESTAMP '2001-01-22 03:04:05'",
      "timestamp(6) with time zone")
    // containers recurse (reference rows 159-163)
    sup("NULL, ARRAY[BIGINT '1']", "array(bigint)")
    sup("ARRAY[BIGINT '1'], ARRAY[DOUBLE '1']", "array(double)")
    sup("ARRAY[BIGINT '1'], ARRAY[NULL]", "array(bigint)")
    // CASE picks the same super type
    vLit("typeof(CASE WHEN true THEN 1 ELSE BIGINT '2' END)", "bigint")
    // documented divergence (docs/MIGRATION.md): Spark's CASE/branch
    // coercion widens real ⊔ integral to double (precision-safe),
    // while UNION/VALUES picks real like the reference — pinned both
    vLit("typeof(CASE WHEN true THEN REAL '1' ELSE BIGINT '2' END)", "double")
    // documented divergence: decimal ⊔ real is double here (Spark
    // widens through double to avoid float precision loss) vs the
    // reference's real
    vLit("typeof(CASE WHEN true THEN DECIMAL '2.2' ELSE REAL '1' END)", "double")
    // IN coerces the probe and list to the common super type
    vLit("1 IN (BIGINT '1', DOUBLE '1.0')", "true")
    vLit("DECIMAL '1.0' IN (1, 2)", "true")
    // incompatible pair refuses to merge (reference isIncompatible:
    // varbinary ⊔ varchar)
    vErr("x FROM (VALUES X'41', 'a') t(x)", "INCOMPATIBLE")
  }

  // ------------------------------------------------------------------
  test("UUID operator contract on the string emulation (TestUuidOperators.java)") {
    // cast validates the 8-4-4-4-12 form and lowercases; the canonical
    // text's lexicographic order IS the reference's order (UuidType
    // compares unsigned byte-reversed longs = unsigned byte order =
    // lowercase-hex order)
    vLit("cast('00000000-0000-0000-0000-000000000000' as UUID)",
      "00000000-0000-0000-0000-000000000000")
    vLit("cast('12151fd2-7586-11e9-8f9e-2a86e4085a59' as UUID)",
      "12151fd2-7586-11e9-8f9e-2a86e4085a59")
    vLit("cast('12151FD2-7586-11E9-8F9E-2A86E4085A59' as UUID)",
      "12151fd2-7586-11e9-8f9e-2a86e4085a59")
    vErr("cast('1-2-3-4-1' as UUID)", "Cannot cast value to UUID")
    vErr("cast('12151fd217586211e938f9e42a86e4085a59' as UUID)",
      "Cannot cast value to UUID")
    vNull("try_cast('1-2-3-4-1' as UUID)")
    // typed literal round-trips through varchar
    vLit("cast(UUID 'd3074e99-de12-4b8c-a2a1-b7faf79faba6' as VARCHAR)",
      "d3074e99-de12-4b8c-a2a1-b7faf79faba6")
    // varbinary → UUID (16 bytes exactly)
    vLit("cast(x'12151fd2758611e98f9e2a86e4085a59' as UUID)",
      "12151fd2-7586-11e9-8f9e-2a86e4085a59")
    vLit("cast(x'00000000000000000000000000000000' as UUID)",
      "00000000-0000-0000-0000-000000000000")
    vErr("cast(x'f000001100' as UUID)", "Invalid UUID binary length")
    // UUID → varbinary is the 16-byte VALUE form, not the text bytes
    // (TestUuidOperators.testUUIDToVarbinaryCast)
    vLit("hex(cast(UUID '00000000-0000-0000-0000-000000000000' as VARBINARY))",
      "00000000000000000000000000000000")
    vLit("hex(cast(UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' as VARBINARY))",
      "6B5F5B6567E443B08EE3586CD49F58A0")
    vLit("cast(UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' as VARBINARY) = x'6b5f5b6567e443b08ee3586cd49f58a0'",
      "true")
    // expression form (not a typed literal): routes through the
    // canonicalizing cast, then the value-form byte kernel
    vLit("hex(cast(cast('6B5F5B65-67E4-43B0-8EE3-586CD49F58A0' as UUID) as VARBINARY))",
      "6B5F5B6567E443B08EE3586CD49F58A0")
    vLit("hex(cast(cast(x'12151fd2758611e98f9e2a86e4085a59' as UUID) as VARBINARY))",
      "12151FD2758611E98F9E2A86E4085A59")
    // equality is case-canonical; ordering matches the reference
    vLit("UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' = UUID '6B5F5B65-67E4-43B0-8EE3-586CD49F58A0'",
      "true")
    vLit("UUID '12151fd2-7586-11e9-8f9e-2a86e4085a58' < UUID '12151fd2-7586-11e9-8f9e-2a86e4085a59'",
      "true")
    vLit("UUID '12151fd2-7586-11e9-8f9e-2a86e4085a59' < UUID '12151fd2-7586-11e9-8f9e-2a86e4085a58'",
      "false")
    vLit("UUID '12151fd2-7586-11e9-8f9e-2a86e4085a58' < UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0'",
      "true")
    vLit("UUID 'dfa7eaf8-6a26-5749-8d36-336025df74e8' > UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0'",
      "true")
    vLit("UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' IS DISTINCT FROM UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0'",
      "false")
    vLit("UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' IS DISTINCT FROM UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a1'",
      "true")
    vLit("CAST(NULL AS UUID) IS DISTINCT FROM CAST(NULL AS UUID)", "false")
    vLit("UUID '6b5f5b65-67e4-43b0-8ee3-586cd49f58a0' IS DISTINCT FROM CAST(NULL AS UUID)",
      "true")
  }

  // ------------------------------------------------------------------
  test("IPADDRESS operator contract on the string emulation (TestIpAddressOperators.java)") {
    // cast parses (no DNS — names raise) and renders the canonical
    // text: dotted quad for IPv4 / IPv4-mapped, RFC 5952 for IPv6
    vLit("cast('::ffff:1.2.3.4' as IPADDRESS)", "1.2.3.4")
    vLit("cast('::ffff:102:304' as IPADDRESS)", "1.2.3.4")
    vLit("cast('1.2.3.4' as IPADDRESS)", "1.2.3.4")
    vLit("cast('192.168.0.0' as IPADDRESS)", "192.168.0.0")
    vLit("cast('2001:0db8:0000:0000:0000:ff00:0042:8329' as IPADDRESS)",
      "2001:db8::ff00:42:8329")
    vLit("cast('2001:db8::ff00:42:8329' as IPADDRESS)", "2001:db8::ff00:42:8329")
    vLit("cast('2001:db8:0:0:1:0:0:1' as IPADDRESS)", "2001:db8::1:0:0:1")
    vLit("cast('2001:db8:0:0:1::1' as IPADDRESS)", "2001:db8::1:0:0:1")
    vLit("cast('2001:db8::1:0:0:1' as IPADDRESS)", "2001:db8::1:0:0:1")
    vLit("cast('2001:DB8::FF00:ABCD:12EF' as IPADDRESS)", "2001:db8::ff00:abcd:12ef")
    vLit("cast('64:ff9b::10.0.0.0' as IPADDRESS)", "64:ff9b::a00:0")
    vLit("cast('::' as IPADDRESS)", "::")
    vLit("cast('::1' as IPADDRESS)", "::1")
    vErr("cast('facebook.com' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vErr("cast('localhost' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vErr("cast('2001:db8::1::1' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vErr("cast('2001:zxy::1::1' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vErr("cast('789.1.1.1' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    // embedded IPv4 is only legal as the address's LAST 32 bits
    vErr("cast('1.2.3.4::' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vNull("try_cast('localhost' as IPADDRESS)")
    // varbinary → IPADDRESS (4 or 16 bytes)
    vLit("cast(x'00000000000000000000ffff01020304' as IPADDRESS)", "1.2.3.4")
    vLit("cast(x'01020304' as IPADDRESS)", "1.2.3.4")
    vLit("cast(x'c0a80000' as IPADDRESS)", "192.168.0.0")
    vLit("cast(x'20010db8000000000000ff0000428329' as IPADDRESS)",
      "2001:db8::ff00:42:8329")
    vErr("cast(x'f000001100' as IPADDRESS)", "Invalid IP address binary length")
    // IPADDRESS → varbinary is the 16-byte VALUE form (IPv4 maps into
    // ::ffff:/96) — TestIpAddressOperators.testIpAddressToVarbinaryCast
    vLit("hex(cast(IPADDRESS '::ffff:1.2.3.4' as VARBINARY))",
      "00000000000000000000FFFF01020304")
    vLit("hex(cast(IPADDRESS '2001:0db8:0000:0000:0000:ff00:0042:8329' as VARBINARY))",
      "20010DB8000000000000FF0000428329")
    vLit("hex(cast(IPADDRESS '2001:db8::ff00:42:8329' as VARBINARY))",
      "20010DB8000000000000FF0000428329")
    vLit("hex(cast(cast('1.2.3.4' as IPADDRESS) as VARBINARY))",
      "00000000000000000000FFFF01020304")
    // strict parse like the reference's Guava InetAddresses.forString:
    // surrounding whitespace and leading-zero IPv4 octets raise
    vErr("cast(' 1.2.3.4' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    vErr("cast('01.2.3.4' as IPADDRESS)", "Cannot cast value to IPADDRESS")
    // typed literal + equality over canonical text
    vLit("cast(IPADDRESS '::ffff:1.2.3.4' as VARCHAR)", "1.2.3.4")
    vLit("IPADDRESS '2001:db8::1:0:0:1' = cast('2001:db8:0:0:1:0:0:1' as IPADDRESS)",
      "true")
    vLit("IPADDRESS '1.2.3.4' = IPADDRESS '::ffff:1.2.3.4'", "true")
    vLit("IPADDRESS '1.2.3.4' IS DISTINCT FROM IPADDRESS '1.2.3.5'", "true")
    // documented divergence (docs/MIGRATION.md): mixed IPv4/IPv6
    // ORDERING compares canonical TEXT here, not the reference's
    // 16-byte form where every IPv4 sorts inside ::ffff:/96 (low) —
    // '9.0.0.0' < '2001:db8::' is true there, false here
    vLit("IPADDRESS '9.0.0.0' < IPADDRESS '2001:db8::'", "false")
    vLit("IPADDRESS '1.2.3.4' < IPADDRESS '1.2.3.5'", "true")
    // text-order divergence also holds WITHIN families: byte order
    // would reverse both of these (10 > 9; 0x1111 > 0x0002)
    vLit("IPADDRESS '10.0.0.1' < IPADDRESS '9.0.0.1'", "true")
    vLit("IPADDRESS '1111::' < IPADDRESS '2::'", "true")
  }

  // ------------------------------------------------------------------
  test("length-parametric character cast VALUE semantics (TestCharacterStringCasts.java)") {
    // varchar(n) truncates
    vLit("cast('bar' as varchar(20))", "bar")
    vLit("cast(cast('bar' as varchar(20)) as varchar(30))", "bar")
    vLit("cast(cast('bar' as varchar(20)) as varchar)", "bar")
    vLit("cast('banana' as varchar(3))", "ban")
    vLit("cast(cast('banana' as varchar(20)) as varchar(3))", "ban")
    // char(n) truncates AND pads; bare CHAR is char(1)
    vLit("cast('bar  ' as char(10))", "bar       ")
    vLit("cast('bar' as char)", "b")
    vLit("cast('   ' as char)", " ")
    // char -> varchar renders the padded value, then truncates
    vLit("cast(cast('bar' as char(5)) as varchar(10))", "bar  ")
    vLit("cast(cast('bar' as char(5)) as varchar(1))", "b")
    vLit("cast(cast('b' as char(5)) as varchar(2))", "b ")
    vLit("cast(cast('b' as char(5)) as varchar(1))", "b")
    vLit("cast(cast('bar' as char(3)) as varchar(3))", "bar")
    vLit("cast(cast('b' as char(3)) as varchar(3))", "b  ")
    // NULL propagates; TRY_CAST keeps NULL-on-failure
    vNull("cast(CAST(NULL AS VARCHAR) as varchar(3))")
    vNull("try_cast(CAST(NULL AS VARCHAR) as char(3))")
  }
}
