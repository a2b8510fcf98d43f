package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Closeout of the reference engine's `operator/scalar` test
  * directory (`core/trino-main/src/test/java/io/trino/operator/
  * scalar/`): every file that tests SQL-visible behavior gets a
  * battery here (or is covered by an earlier spec and cited in
  * docs/CONFORMANCE.md); files that test reference-internal SPI
  * plumbing (function-binding annotations, page-processor compilers,
  * parser validation) are documented out of scope.
  *
  * Replay conventions follow ReferenceSqlVectorsSpec: queries run
  * through `Dialect.translate` + `spark.sql`; `.matches(...)`
  * vectors run BOTH sides through the engine; literal expectations
  * compare against canonicalized collected values. Documented
  * engine-mapping adaptations, each noted at the vector:
  *
  *  - the COLOR type maps to BIGINT (same encoding: 24-bit RGB /
  *    -(index+1) for ANSI system colors);
  *  - `typeof` renders length-parametric VARCHAR(n) as plain
  *    `varchar` outside table schemas (Spark erases literal lengths);
  *  - map-key error MESSAGES assert this engine's stable fragments
  *    (Spark: "null as map key" / "Duplicate map key") for the same
  *    error conditions the reference pins;
  *  - `version()` returns this engine's version string (the
  *    reference's vector pins its test-harness node version);
  *  - `fail(json)` with a FailureInfo payload is reference-internal
  *    wire format; the SQL-visible fail(message) contract is covered
  *    by the TRY battery in ReferenceSqlVectorsSpec.
  */
class ReferenceScalarCorporaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var vectorCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-scalar-corpora", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"replayed $vectorCount reference operator/scalar vectors")
    if (spark != null) spark.stop()
  }

  private def runQ(sql: String): DataFrame =
    spark.sql(graft.sqlcompat.Dialect.translate(sql))

  private def canonVal(v: Any): String = v match {
    case null => "ø"
    case b: Array[Byte] => b.map("%02X".format(_)).mkString
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case f: Float => canonVal(f.toDouble)
    case d: Double if d.isNaN || d.isInfinite => d.toString
    case d: Double =>
      new java.math.BigDecimal(d.toString).stripTrailingZeros.toPlainString
    case n: Number =>
      new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => canonVal(r.get(i))).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, v) => canonVal(k) + "→" + canonVal(v) }
        .sorted.mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(canonVal).mkString("[", ",", "]")
    case other => other.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => canonVal(r.get(i))).mkString("|"))

  /** `.matches` vector: both sides through the engine. */
  private def v(query: String, expected: String): Unit = {
    vectorCount += 1
    val got = rows(runQ(s"SELECT $query")).sorted
    val want = rows(runQ(s"SELECT $expected")).sorted
    assert(got == want, s"\nexpr:     $query\ngot:      $got\nexpected: $want")
  }

  /** Literal-expectation vector (reference `.isEqualTo`). */
  private def vLit(expr: String, expected: String): Unit = {
    vectorCount += 1
    val got = rows(runQ(s"SELECT $expr"))
    def hex(s: String) = s.map(c => f"${c.toInt}%x").mkString(" ")
    assert(got == Seq(expected),
      s"\nexpr:     $expr\ngot:      $got\nexpected: $expected" +
        s"\ngot-hex:  ${got.map(hex)}\nwant-hex: ${hex(expected)}")
  }

  private def vNull(expr: String): Unit = {
    vectorCount += 1
    val got = rows(runQ(s"SELECT $expr"))
    assert(got == Seq("ø"), s"\nexpected NULL from: $expr\ngot: $got")
  }

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
  test("color function vectors (TestColorFunctions.java:40-166)") {
    // parseRgb / named colors (COLOR ↦ BIGINT, same encoding)
    vLit("color('#F00')", (0xFF0000L).toString)
    vLit("color('#0F0')", (0x00FF00L).toString)
    vLit("color('#00F')", (0x0000FFL).toString)
    vLit("color('#700')", (0x770000L).toString)
    vLit("color('#070')", (0x007700L).toString)
    vLit("color('#007')", (0x000077L).toString)
    vLit("color('#cde')", (0xCCDDEEL).toString)
    vLit("color('black')", "-1")
    vLit("color('red')", "-2")
    vLit("color('green')", "-3")
    vLit("color('yellow')", "-4")
    vLit("color('blue')", "-5")
    vLit("color('magenta')", "-6")
    vLit("color('cyan')", "-7")
    vLit("color('white')", "-8")
    vErr("color('sparkly')", "Invalid color: 'sparkly'")
    // rgb
    vLit("rgb(255, 0, 0)", (0xFF0000L).toString)
    vLit("rgb(0, 255, 0)", (0x00FF00L).toString)
    vLit("rgb(0, 0, 255)", (0x0000FFL).toString)
    vErr("rgb(256, 0, 0)", "red must be between 0 and 255")
    vErr("rgb(0, -1, 0)", "green must be between 0 and 255")
    // interpolation (testInterpolate)
    vLit("color(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(255 AS DOUBLE), color('#000'), color('#fff'))", "0")
    vLit("color(CAST(128 AS DOUBLE), CAST(0 AS DOUBLE), CAST(255 AS DOUBLE), color('#000'), color('#fff'))",
      (0x808080L).toString)
    vLit("color(CAST(255 AS DOUBLE), CAST(0 AS DOUBLE), CAST(255 AS DOUBLE), color('#000'), color('#fff'))",
      (0xFFFFFFL).toString)
    vLit("color(CAST(-1 AS DOUBLE), CAST(42 AS DOUBLE), CAST(52 AS DOUBLE), rgb(255, 0, 0), rgb(255, 255, 0))",
      (0xFF0000L).toString)
    vLit("color(CAST(47 AS DOUBLE), CAST(42 AS DOUBLE), CAST(52 AS DOUBLE), rgb(255, 0, 0), rgb(255, 255, 0))",
      (0xFF8000L).toString)
    vLit("color(CAST(142 AS DOUBLE), CAST(42 AS DOUBLE), CAST(52 AS DOUBLE), rgb(255, 0, 0), rgb(255, 255, 0))",
      (0xFFFF00L).toString)
    vLit("color(CAST(-42 AS DOUBLE), color('#000'), color('#fff'))", "0")
    vLit("color(CAST(0 AS DOUBLE), color('#000'), color('#fff'))", "0")
    vLit("color(CAST(0.5 AS DOUBLE), color('#000'), color('#fff'))", (0x808080L).toString)
    vLit("color(CAST(1.0 AS DOUBLE), color('#000'), color('#fff'))", (0xFFFFFFL).toString)
    vLit("color(CAST(42 AS DOUBLE), color('#000'), color('#fff'))", (0xFFFFFFL).toString)
    // bar (exact ANSI escapes, xterm-256 cube)
    vLit("bar(0.6, 5, color('#f0f'), color('#00f'))",
      "\u001b[38;5;201m█\u001b[38;5;165m█\u001b[38;5;129m█\u001b[0m  ")
    vLit("bar(1.0, 10, color('#f00'), color('#0f0'))",
      "\u001b[38;5;196m█\u001b[38;5;202m█\u001b[38;5;208m█" +
        "\u001b[38;5;214m█\u001b[38;5;226m█\u001b[38;5;226m█" +
        "\u001b[38;5;154m█\u001b[38;5;118m█\u001b[38;5;82m█" +
        "\u001b[38;5;46m█\u001b[0m")
    // render
    vLit("render(true)", "\u001b[38;5;2m✓\u001b[0m")
    vLit("render(false)", "\u001b[38;5;1m✗\u001b[0m")
    vLit("render('hello', color('red'))", "\u001b[38;5;1mhello\u001b[0m")
    vLit("render('hello', color('#f00'))", "\u001b[38;5;196mhello\u001b[0m")
    vLit("render('hello', color('#0f0'))", "\u001b[38;5;46mhello\u001b[0m")
    vLit("render('hello', color('#00f'))", "\u001b[38;5;21mhello\u001b[0m")
    vLit("render(1234, color('red'))", "\u001b[38;5;1m1234\u001b[0m")
    vLit("render(CAST(1234.5678 AS DOUBLE), color('red'))",
      "\u001b[38;5;1m1234.5678\u001b[0m")
    // indeterminate: color(null) is null (COLOR ↦ BIGINT nullable)
    vNull("color(CAST(NULL AS VARCHAR))")
  }

  // ------------------------------------------------------------------
  test("typeof vectors (TestTypeOfFunction.java:45-113)") {
    vLit("typeof(CAST(1 AS BIGINT))", "bigint")
    vLit("typeof(CAST(1 AS INTEGER))", "integer")
    vLit("typeof(CAST(1 AS VARCHAR))", "varchar")
    vLit("typeof(CAST(1 AS DOUBLE))", "double")
    vLit("typeof(123)", "integer")
    // reference: varchar(3) — literal lengths erase here (doc'd)
    vLit("typeof('cat')", "varchar")
    vLit("typeof(NULL)", "unknown")
    vLit("typeof(CAST(NULL AS VARCHAR))", "varchar")
    vLit("typeof(CAST(NULL AS DECIMAL(5,1)))", "decimal(5,1)")
    vLit("typeof(CAST(NULL AS ARRAY(INTEGER)))", "array(integer)")
    vLit("typeof(CAST(NULL AS ARRAY(DECIMAL(5,1))))", "array(decimal(5,1))")
    vLit("typeof(CAST(NULL AS ARRAY(ARRAY(ARRAY(INTEGER)))))",
      "array(array(array(integer)))")
    vLit("typeof(CONCAT('ala', 'ma', 'kota'))", "varchar")
    vLit("typeof(ARRAY[CAST(1 AS INTEGER), CAST(2 AS INTEGER)])", "array(integer)")
    vLit("typeof(sin(2))", "double")
    vLit("typeof(2 + sin(2) + 2.3)", "double")
    // engine additions beyond the reference vectors
    vLit("typeof(CAST(1 AS SMALLINT))", "smallint")
    vLit("typeof(CAST(1 AS TINYINT))", "tinyint")
    vLit("typeof(CAST(1 AS REAL))", "real")
    vLit("typeof(true)", "boolean")
    vLit("typeof(DATE '2020-01-01')", "date")
    vLit("typeof(MAP(ARRAY[1], ARRAY['a']))", "map(integer, varchar)")
  }

  // ------------------------------------------------------------------
  test("version vector (TestVersionFunction.java:25)") {
    // reference pins its harness node version ("<unknown>"); ours
    // reports the engine + Spark runtime version — assert the shape
    vectorCount += 1
    val got = rows(runQ("SELECT version()"))
    assert(got.length == 1 && got.head.startsWith("graft"), s"version(): $got")
  }

  // ------------------------------------------------------------------
  test("concat_ws vectors (TestConcatWsFunction.java:45-190)") {
    vLit("concat_ws('abc', 'def')", "def")
    vLit("concat_ws(',', 'def')", "def")
    vLit("concat_ws(',', 'def', 'pqr', 'mno')", "def,pqr,mno")
    vLit("concat_ws('abc', 'def', 'pqr')", "defabcpqr")
    vLit("concat_ws('', 'def')", "def")
    vLit("concat_ws('', 'def', 'pqr')", "defpqr")
    vLit("concat_ws('', '', 'pqr')", "pqr")
    vLit("concat_ws('', 'def', '')", "def")
    vLit("concat_ws('', '', '')", "")
    vLit("concat_ws(',', 'def', '')", "def,")
    vLit("concat_ws(',', 'def', '', 'pqr')", "def,,pqr")
    vLit("concat_ws(',', '', 'pqr')", ",pqr")
    vNull("concat_ws(CAST(NULL AS VARCHAR), 'def')")
    vNull("concat_ws(CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))")
    vNull("concat_ws(CAST(NULL AS VARCHAR), 'def', 'pqr')")
    vLit("concat_ws(',', CAST(NULL AS VARCHAR))", "")
    vLit("concat_ws(',', CAST(NULL AS VARCHAR), 'pqr')", "pqr")
    vLit("concat_ws(',', 'def', CAST(NULL AS VARCHAR))", "def")
    vLit("concat_ws(',', 'def', CAST(NULL AS VARCHAR), 'pqr')", "def,pqr")
    vLit("concat_ws(',', 'def', NULL, NULL, 'mno', 'xyz', NULL, 'box')",
      "def,mno,xyz,box")
    // array form
    vLit("concat_ws(',', ARRAY[])", "")
    vLit("concat_ws(',', ARRAY['abc'])", "abc")
    vLit("concat_ws(',', ARRAY['abc', 'def', 'pqr', 'xyz'])", "abc,def,pqr,xyz")
    vNull("concat_ws(CAST(NULL AS VARCHAR), ARRAY['abc'])")
    vNull("concat_ws(',', CAST(NULL AS array(varchar)))")
    vLit("concat_ws(',', ARRAY['abc', null, null, 'xyz'])", "abc,xyz")
    vLit("concat_ws(',', ARRAY['abc', '', '', 'xyz', 'abcdefghi'])",
      "abc,,,xyz,abcdefghi")
    // 1-arg form rejected (reference: "There must be two or more
    // arguments"); the int-args form is accepted leniently here via
    // implicit casts (documented wider acceptance)
    vErr("concat_ws(',')", "There must be two or more arguments")
  }

  // ------------------------------------------------------------------
  test("trim_array vectors (TestArrayTrimFunction.java:50-82)") {
    v("trim_array(ARRAY[1, 2, 3, 4], 2)", "ARRAY[1, 2]")
    v("trim_array(ARRAY[1, 2, 3, 4], 0)", "ARRAY[1, 2, 3, 4]")
    v("trim_array(ARRAY[1, 2, 3, 4], 1)", "ARRAY[1, 2, 3]")
    v("trim_array(ARRAY[1, 2, 3, 4], 3)", "ARRAY[1]")
    v("trim_array(ARRAY[1, 2, 3, 4], 4)", "CAST(ARRAY[] AS array(integer))")
    v("trim_array(ARRAY['a', 'b', 'c', 'd'], 1)", "ARRAY['a', 'b', 'c']")
    v("trim_array(ARRAY['a', 'b', null, 'd'], 1)", "ARRAY['a', 'b', null]")
    v("trim_array(ARRAY[ARRAY[1, 2, 3], ARRAY[4, 5, 6]], 1)",
      "ARRAY[ARRAY[1, 2, 3]]")
    vErr("trim_array(ARRAY[1, 2, 3, 4], 5)",
      "size must not exceed array cardinality 4: 5")
    vErr("trim_array(ARRAY[1, 2, 3, 4], -1)", "size must not be negative: -1")
  }

  // ------------------------------------------------------------------
  test("contains_sequence vectors (TestArrayContainsSequence.java:43-84)") {
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[1, 2])", "true")
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[3, 4])", "true")
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[5, 6])", "true")
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[1, 2, 4])", "false")
    vLit("contains_sequence(ARRAY[1, 2, 3, NULL, 4, 5, 6], ARRAY[3, NULL, 4])", "true")
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[1, 2, 3, 4, 5, 6])", "true")
    vLit("contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[])", "true")
    vLit("contains_sequence(ARRAY['1', '2', '3'], ARRAY['1', '2'])", "true")
    vLit("contains_sequence(ARRAY[1.1, 2.2, 3.3], ARRAY[1.1, 2.2])", "true")
    vLit("contains_sequence(ARRAY[ARRAY[1,2], ARRAY[3], ARRAY[4,5]], ARRAY[ARRAY[1,2], ARRAY[3]])", "true")
    vLit("contains_sequence(ARRAY[ARRAY[1,2], ARRAY[3], ARRAY[4,5]], ARRAY[ARRAY[1,2], ARRAY[4]])", "false")
    for (i <- 1 to 6)
      vLit(s"contains_sequence(ARRAY[1, 2, 3, 4, 5, 6], ARRAY[$i])", "true")
  }

  // ------------------------------------------------------------------
  test("array_except vectors (TestArrayExceptFunction.java:43-124)") {
    v("array_except(ARRAY[1, 5, 3], ARRAY[3])", "ARRAY[1, 5]")
    v("array_except(ARRAY[BIGINT '1', 5, 3], ARRAY[5])",
      "ARRAY[BIGINT '1', BIGINT '3']")
    v("array_except(ARRAY['x', 'y', 'z'], ARRAY['x'])", "ARRAY['y', 'z']")
    v("array_except(ARRAY[true, false, null], ARRAY[true])",
      "ARRAY[false, null]")
    v("array_except(ARRAY[1.1E0, 5.4E0, 3.9E0], ARRAY[5, 5.4E0])",
      "ARRAY[1.1E0, 3.9E0]")
    v("array_except(ARRAY[], ARRAY[])", "ARRAY[]")
    v("array_except(CAST(ARRAY[] AS array(integer)), ARRAY[1, 3])",
      "CAST(ARRAY[] AS array(integer))")
    v("array_except(ARRAY['abc'], ARRAY[])", "ARRAY['abc']")
    // the reference's bare NULL arguments coerce via its UNKNOWN
    // type; typed NULLs here (engine requires explicit array type)
    vNull("array_except(ARRAY[NULL], CAST(NULL AS array(integer)))")
    vNull("array_except(CAST(NULL AS array(integer)), CAST(NULL AS array(integer)))")
    vNull("array_except(CAST(NULL AS array(integer)), ARRAY[NULL])")
    v("array_except(ARRAY[NULL], ARRAY[NULL])", "ARRAY[]")
    v("array_except(ARRAY[], ARRAY[NULL])", "ARRAY[]")
    v("array_except(ARRAY[NULL], ARRAY[])", "ARRAY[NULL]")
    // duplicates dedup
    v("array_except(ARRAY[1, 5, 3, 5, 1], ARRAY[3])", "ARRAY[1, 5]")
    v("array_except(ARRAY[BIGINT '1', 5, 5, 3, 3, 3, 1], ARRAY[3, 5])",
      "ARRAY[BIGINT '1']")
    v("array_except(ARRAY['x', 'x', 'y', 'z'], ARRAY['x', 'y', 'x'])",
      "ARRAY['z']")
    v("array_except(ARRAY[true, false, null, true, false, null], ARRAY[true, true, true])",
      "ARRAY[false, null]")
    // NaN is a distinct-comparable value
    v("array_except(ARRAY[nan()], ARRAY[nan()])", "CAST(ARRAY[] AS array(double))")
    v("array_except(ARRAY[1, nan(), 3], ARRAY[nan(), 3])", "ARRAY[1E0]")
  }

  // ------------------------------------------------------------------
  test("filter lambda vectors (TestArrayFilterFunction.java:43-154)") {
    v("filter(ARRAY[5, 6], x -> x = 5)", "ARRAY[5]")
    v("filter(ARRAY[true, false, true, false], x -> nullif(x, false))",
      "ARRAY[true, true]")
    v("filter(ARRAY[true, false, null, true, false, null], x -> not x)",
      "ARRAY[false, false]")
    v("filter(ARRAY[], x -> true)", "ARRAY[]")
    v("filter(ARRAY[], x -> false)", "ARRAY[]")
    v("filter(ARRAY[], x -> CAST(null AS boolean))", "ARRAY[]")
    v("filter(CAST(ARRAY[] AS array(integer)), x -> true)",
      "CAST(ARRAY[] AS array(integer))")
    v("filter(ARRAY[NULL], x -> x IS NULL)", "ARRAY[NULL]")
    v("filter(ARRAY[NULL], x -> x IS NOT NULL)", "ARRAY[]")
    v("filter(ARRAY[CAST(NULL AS integer)], x -> x IS NULL)",
      "CAST(ARRAY[NULL] AS array(integer))")
    v("filter(ARRAY[NULL, NULL, NULL], x -> x IS NULL)",
      "ARRAY[NULL, NULL, NULL]")
    v("filter(ARRAY[NULL, NULL, NULL], x -> x IS NOT NULL)", "ARRAY[]")
    v("filter(ARRAY[25, 26, NULL], x -> x % 2 = 1 OR x IS NULL)",
      "ARRAY[25, NULL]")
  }

  // ------------------------------------------------------------------
  test("combinations vectors (TestArrayCombinationsFunction.java:44-120)") {
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 0)", "ARRAY[ARRAY[]]")
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 1)",
      "ARRAY[ARRAY['bar'], ARRAY['foo'], ARRAY['baz'], ARRAY['foo']]")
    // colexicographic enumeration order, pinned exactly
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 2)",
      "ARRAY[ARRAY['bar','foo'], ARRAY['bar','baz'], ARRAY['foo','baz'], " +
        "ARRAY['bar','foo'], ARRAY['foo','foo'], ARRAY['baz','foo']]")
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 3)",
      "ARRAY[ARRAY['bar','foo','baz'], ARRAY['bar','foo','foo'], " +
        "ARRAY['bar','baz','foo'], ARRAY['foo','baz','foo']]")
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 4)",
      "ARRAY[ARRAY['bar','foo','baz','foo']]")
    v("combinations(ARRAY['bar', 'foo', 'baz', 'foo'], 5)",
      "CAST(ARRAY[] AS array(array(varchar)))")
    v("combinations(ARRAY['a', 'bb', 'ccc', 'dddd'], 2)",
      "ARRAY[ARRAY['a','bb'], ARRAY['a','ccc'], ARRAY['bb','ccc'], " +
        "ARRAY['a','dddd'], ARRAY['bb','dddd'], ARRAY['ccc','dddd']]")
    vErr("combinations(sequence(1, 40), -1)",
      "combination size must not be negative: -1")
    vErr("combinations(sequence(1, 40), 10)",
      "combination size must not exceed 5: 10")
    vErr("combinations(sequence(1, 100), 5)", "combinations exceed max size")
    // cardinality identities: C(n, k)
    for (n <- 0 until 5; k <- 0 to n) {
      val fact = (x: Int) => (1 to x).product
      val arr = (0 until n).mkString("ARRAY[", ",", "]")
      vLit(s"cardinality(combinations($arr, $k))",
        (fact(n) / fact(n - k) / fact(k)).toString)
    }
  }

  // ------------------------------------------------------------------
  test("word_stem vectors (TestWordStemFunction.java:40-127)") {
    vLit("word_stem('')", "")
    vLit("word_stem('x')", "x")
    vLit("word_stem('abc')", "abc")
    vLit("word_stem('generally')", "general")
    vLit("word_stem('useful')", "use")
    vLit("word_stem('runs')", "run")
    vLit("word_stem('run')", "run")
    vLit("word_stem('authorized', 'en')", "author")
    vLit("word_stem('accessories', 'en')", "accessori")
    vLit("word_stem('intensifying', 'en')", "intensifi")
    vLit("word_stem('resentment')", "resent")
    vLit("word_stem('faithfulness')", "faith")
    // non-English stemmers are a documented subset gap: loud error,
    // not a silent wrong answer (reference ships Snowball per-language)
    vErr("word_stem('continuerait', 'fr')", "Unknown stemmer language")
  }

  // ------------------------------------------------------------------
  test("format_number vectors (TestFormatNumberFunction.java:40-209)") {
    vLit("format_number(TINYINT '123')", "123")
    vLit("format_number(SMALLINT '12345')", "12.3K")
    vLit("format_number(SMALLINT '12399')", "12.4K")
    vLit("format_number(INTEGER '12345678')", "12.3M")
    vLit("format_number(INTEGER '12399999')", "12.4M")
    vLit("format_number(BIGINT '12345678901')", "12.3B")
    vLit("format_number(BIGINT '12399999999')", "12.4B")
    vLit("format_number(DOUBLE '1234.5')", "1.23K")
    vLit("format_number(DOUBLE '1239.9')", "1.24K")
    vLit("format_number(REAL '1234567.8')", "1.23M")
    vLit("format_number(REAL '1239999.9')", "1.24M")
    vLit("format_number(DECIMAL '1234567890.1')", "1.23B")
    vLit("format_number(DECIMAL '1239999999.9')", "1.24B")
    vLit("format_number(-999)", "-999")
    vLit("format_number(-1000)", "-1K")
    vLit("format_number(-999999)", "-1000K")
    vLit("format_number(-1000000)", "-1M")
    vLit("format_number(-999999999)", "-1000M")
    vLit("format_number(-1000000000)", "-1B")
    vLit("format_number(-999999999999)", "-1000B")
    vLit("format_number(-1000000000000)", "-1T")
    vLit("format_number(-999999999999999)", "-1000T")
    vLit("format_number(-1000000000000000)", "-1Q")
    vLit("format_number(-9223372036854775808)", "-9223.37Q")
    vLit("format_number(0)", "0")
    vLit("format_number(999)", "999")
    vLit("format_number(1000)", "1K")
    vLit("format_number(999999)", "1000K")
    vLit("format_number(1000000)", "1M")
    vLit("format_number(999999999)", "1000M")
    vLit("format_number(1000000000)", "1B")
    vLit("format_number(999999999999)", "1000B")
    vLit("format_number(1000000000000)", "1T")
    vLit("format_number(999999999999999)", "1000T")
    vLit("format_number(1000000000000000)", "1Q")
    // getFormat() sees the reduced POSITIVE 9223.37 (≥ 100 → no
    // decimals), unlike Long.MIN where the negative takes "#.##"
    vLit("format_number(9223372036854775807)", "9223Q")
    vNull("format_number(CAST(NULL AS BIGINT))")
  }

  // ------------------------------------------------------------------
  test("map_zip_with vectors (TestMapZipWithFunction.java:40-126)") {
    v("map_zip_with(map(ARRAY[1, 2, 3], ARRAY[10, 20, 30]), " +
      "map(ARRAY[1, 2, 3], ARRAY[1, 4, 9]), (k, v1, v2) -> k + v1 + v2)",
      "map(ARRAY[1, 2, 3], ARRAY[12, 26, 42])")
    v("map_zip_with(map(ARRAY['a', 'b'], ARRAY[1, 2]), " +
      "map(ARRAY['c', 'd'], ARRAY[30, 40]), (k, v1, v2) -> v1)",
      "map(ARRAY['a', 'b', 'c', 'd'], ARRAY[1, 2, NULL, NULL])")
    v("map_zip_with(map(ARRAY['a', 'b'], ARRAY[1, 2]), " +
      "map(ARRAY['c', 'd'], ARRAY[30, 40]), (k, v1, v2) -> v2)",
      "map(ARRAY['a', 'b', 'c', 'd'], ARRAY[NULL, NULL, 30, 40])")
    v("map_zip_with(map(ARRAY[25, 26, 27], ARRAY[25, 26, 27]), " +
      "map(ARRAY[25, 26, 27], ARRAY[1, 2, 3]), (k, v1, v2) -> v1 * v2 - k)",
      "map(ARRAY[25, 26, 27], ARRAY[0, 26, 54])")
    v("map_zip_with(map(ARRAY[25.5E0, 26.75E0, 27.875E0], ARRAY[25, 26, 27]), " +
      "map(ARRAY[25.5E0, 26.75E0, 27.875E0], ARRAY[1, 2, 3]), (k, v1, v2) -> v1 + v2 - k)",
      "map(ARRAY[25.5E0, 26.75E0, 27.875E0], ARRAY[0.5E0, 1.25E0, 2.125E0])")
    v("map_zip_with(map(ARRAY[true, false], ARRAY[25, 26]), " +
      "map(ARRAY[true, false], ARRAY[1, 2]), (k, v1, v2) -> k AND v1 % v2 = 0)",
      "map(ARRAY[true, false], ARRAY[true, false])")
    v("map_zip_with(map(ARRAY['s0', 's1', 's2'], ARRAY[25, 26, 27]), " +
      "map(ARRAY['s0', 's1', 's2'], ARRAY[1, 2, 3]), " +
      "(k, v1, v2) -> k || ':' || CAST(v1/v2 AS VARCHAR))",
      "map(ARRAY['s0', 's1', 's2'], ARRAY['s0:25', 's1:13', 's2:9'])")
  }

  // ------------------------------------------------------------------
  test("map lambda error contracts (TestMapTransformKeysFunction.java:105-137, TestMapFilterFunction, TestMapTransformValuesFunction)") {
    // positive shapes
    v("transform_keys(map(ARRAY[1, 2, 3], ARRAY['a', 'b', 'c']), (k, v) -> k + 1)",
      "map(ARRAY[2, 3, 4], ARRAY['a', 'b', 'c'])")
    v("transform_values(map(ARRAY[1, 2, 3], ARRAY[10, 20, 30]), (k, v) -> v + k)",
      "map(ARRAY[1, 2, 3], ARRAY[11, 22, 33])")
    v("map_filter(map(ARRAY[1, 2, 3, 4], ARRAY[10, 20, 30, NULL]), (k, v) -> v IS NOT NULL)",
      "map(ARRAY[1, 2, 3], ARRAY[10, 20, 30])")
    v("map_filter(map(ARRAY[], ARRAY[]), (k, v) -> true)", "map(ARRAY[], ARRAY[])")
    // NULL new key → error (reference: "map key cannot be null";
    // engine message: "null as map key" — same condition, doc'd text)
    vErr("transform_keys(map(ARRAY[1], ARRAY['a']), (k, v) -> CAST(NULL AS INTEGER))",
      "map key")
    // duplicate new key: the reference raises "Duplicate keys (1) are
    // not allowed"; this engine keeps the LAST value — the session
    // pins mapKeyDedupPolicy=LAST_WIN for map_concat conformance
    // (engine/Graft.scala:72, documented lenient-direction divergence)
    v("transform_keys(map(ARRAY[1, 4], ARRAY['a', 'b']), (k, v) -> k % 3)",
      "map(ARRAY[1], ARRAY['b'])")
  }

  // ------------------------------------------------------------------
  test("zip vectors (TestZipFunction.java:40-154)") {
    v("zip(ARRAY[1, 2], ARRAY['a', 'b'])",
      "ARRAY[ROW(1, 'a'), ROW(2, 'b')]")
    v("zip(ARRAY[1, 2, 3, 4], ARRAY['a', 'b', 'c', 'd'])",
      "ARRAY[ROW(1, 'a'), ROW(2, 'b'), ROW(3, 'c'), ROW(4, 'd')]")
    v("zip(ARRAY[1, 2], ARRAY['a', 'b'], ARRAY['c', 'd'])",
      "ARRAY[ROW(1, 'a', 'c'), ROW(2, 'b', 'd')]")
    v("zip(ARRAY[1, 2], ARRAY['a', 'b'], ARRAY['c', 'd'], ARRAY['e', 'f'])",
      "ARRAY[ROW(1, 'a', 'c', 'e'), ROW(2, 'b', 'd', 'f')]")
    // different lengths pad with NULL
    v("zip(ARRAY[1], ARRAY['a', 'b'])",
      "ARRAY[ROW(1, 'a'), ROW(CAST(NULL AS INTEGER), 'b')]")
    v("zip(ARRAY[NULL, 2], ARRAY['a'])",
      "ARRAY[ROW(CAST(NULL AS INTEGER), 'a'), ROW(2, CAST(NULL AS VARCHAR))]")
    // NULL array argument → NULL result
    vNull("zip(CAST(NULL AS array(integer)), ARRAY[1])")
  }

  // ------------------------------------------------------------------
  test("zip_with vectors (TestZipWithFunction.java:40-167)") {
    v("zip_with(ARRAY[1, 2], ARRAY['a', 'b'], (x, y) -> (y, x))",
      "ARRAY[ROW('a', 1), ROW('b', 2)]")
    v("zip_with(ARRAY[1, 2], ARRAY[3, 4], (x, y) -> x + y)",
      "ARRAY[4, 6]")
    v("zip_with(CAST(ARRAY[3, 5] AS ARRAY(BIGINT)), CAST(ARRAY[1, 3] AS ARRAY(BIGINT)), (x, y) -> x * y)",
      "ARRAY[BIGINT '3', BIGINT '15']")
    v("zip_with(ARRAY[true, false], ARRAY[false, true], (x, y) -> x OR y)",
      "ARRAY[true, true]")
    v("zip_with(ARRAY['a', 'b'], ARRAY['c', 'd'], (x, y) -> concat(x, y))",
      "ARRAY['ac', 'bd']")
    // shorter side extends with NULL
    v("zip_with(ARRAY[1, 2, 3], ARRAY['a', 'b'], (x, y) -> (x, y))",
      "ARRAY[ROW(1, 'a'), ROW(2, 'b'), ROW(3, CAST(NULL AS VARCHAR))]")
    v("zip_with(ARRAY[], ARRAY[1, 2], (x, y) -> coalesce(x, y))",
      "ARRAY[1, 2]")
    vNull("zip_with(CAST(NULL AS array(integer)), ARRAY[1, 2], (x, y) -> y)")
  }

  // ------------------------------------------------------------------
  test("json_extract / json_extract_scalar / json_size vectors (TestJsonExtract.java:213-330)") {
    // testFullScalarExtract rows via the SQL function (the internal
    // extractor these unit rows call is exactly what it routes to)
    vNull("json_extract_scalar('{}', '$')")
    vNull("""json_extract_scalar('{"fuu": {"bar": 1}}', '$.fuu')""")
    vLit("""json_extract_scalar('{"fuu": 1}', '$.fuu')""", "1")
    vLit("""json_extract_scalar('{"fuu": 1}', '$["fuu"]')""", "1")
    vNull("""json_extract_scalar('{"fuu": null}', '$.fuu')""")
    vNull("""json_extract_scalar('{"fuu": 1}', '$.bar')""")
    vLit("""json_extract_scalar('{"fuu": 1, "bar": "abc"}', '$.bar')""", "abc")
    vLit("""json_extract_scalar('{"fuu": [0.1, 1, 2]}', '$.fuu[0]')""", "0.1")
    vNull("""json_extract_scalar('{"fuu": [0, [100, 101], 2]}', '$.fuu[1]')""")
    vLit("""json_extract_scalar('{"fuu": [0, [100, 101], 2]}', '$.fuu[1][1]')""", "101")
    vLit("""json_extract_scalar('{"fuu": [0, {"bar": {"key" : ["value"]}}, 2]}', '$.fuu[1].bar.key[0]')""", "value")
    vLit("json_extract_scalar('[0, 1, 2]', '$[0]')", "0")
    vLit("""json_extract_scalar('"abc"', '$')""", "abc")
    vLit("json_extract_scalar('123', '$')", "123")
    vNull("json_extract_scalar('null', '$')")
    vLit("json_extract_scalar('[0, 1, 2]', '$[1]')", "1")
    // testFullJsonExtract rows
    vLit("json_extract('{}', '$')", "{}")
    vLit("""json_extract('{"fuu": {"bar": 1}}', '$.fuu')""", """{"bar":1}""")
    vLit("""json_extract('{"fuu": 1}', '$.fuu')""", "1")
    vLit("""json_extract('{"fuu": null}', '$.fuu')""", "null")
    vNull("""json_extract('{"fuu": 1}', '$.bar')""")
    vLit("""json_extract('{"fuu": 1, "bar": "abc"}', '$.bar')""", "\"abc\"")
    vLit("""json_extract('{"fuu": [0.1, 1, 2]}', '$.fuu[0]')""", "0.1")
    vLit("""json_extract('{"fuu": [0, [100, 101], 2]}', '$.fuu[1]')""", "[100,101]")
    vLit("""json_extract('{"fuu": [0, [100, 101], 2]}', '$.fuu[1][1]')""", "101")
    vLit("json_extract('[0, 1, 2]', '$[0]')", "0")
    vLit("""json_extract('"abc"', '$')""", "\"abc\"")
    vLit("json_extract('123', '$')", "123")
    vLit("json_extract('null', '$')", "null")
    vLit("""json_extract('{"fuu": {"bar": 1}}', '$["fuu"]')""", """{"bar":1}""")
    vLit("""json_extract('{"fuu": {"bar": 1}}', '$["fuu"]["bar"]')""", "1")
    vLit("""json_extract('{"@$fuu": {".b.ar": 1}}', '$["@$fuu"]')""", """{".b.ar":1}""")
    vLit("""json_extract('{"@$fuu": {".b.ar": 1}}', '$["@$fuu"][".b.ar"]')""", "1")
    // json_size (testJsonSize block of JsonFunctions — size semantics
    // pinned here for the extractor path)
    vLit("""json_size('{"fuu": {"bar": 1}}', '$.fuu')""", "1")
    vLit("""json_size('{"fuu": [0, 1, 2]}', '$.fuu')""", "3")
    vLit("""json_size('{"fuu": 1}', '$.fuu')""", "0")
    vLit("json_size('[0, 1, 2]', '$')", "3")
    // legacy-only path forms: array/object duality of numeric tokens,
    // unquoted bracket members, digit-leading member names, trailing
    // commas (the reference's STREAMING parse never reaches them;
    // the tree parse here opts into ALLOW_TRAILING_COMMA)
    vLit("json_extract_scalar('[0, 1, 2]', '$.1')", "1")
    vLit("""json_extract_scalar('{"fuu": 1}', '$[fuu]')""", "1")
    vLit("""json_extract_scalar('{"0" : 0, "1" : 1, "2" : 2, }', '$.1')""", "1")
    vLit("""json_extract_scalar('{"0" : 0, "1" : 1, "2" : 2, }', '$[1]')""", "1")
    vLit("""json_extract_scalar('{"0" : 0, "1" : 1, "2" : 2, }', '$["1"]')""", "1")
    vLit("""json_extract_scalar('{"15day" : 0, "30day" : 1, "90day" : 2, }', '$.30day')""", "1")
    vLit("""json_extract_scalar('{"15day" : 0, "30day" : 1, "90day" : 2, }', '$[30day]')""", "1")
    vLit("""json_extract_scalar('{"15day" : 0, "30day" : 1, "90day" : 2, }', '$["30day"]')""", "1")
    vErr("""json_extract_scalar('{"fuu": 1}', 'fuu')""", "Invalid JSON path")
  }

  // ------------------------------------------------------------------
  test("json_parse / json_format vectors (TestJsonFunctions.java:640-700)") {
    // JSON ↦ VARCHAR here: parse = validate + canonical compact form
    vLit("json_parse('[1, 2, 3]')", "[1,2,3]")
    vLit("""json_parse('{"a" : 1, "b" : [2, 3]}')""", """{"a":1,"b":[2,3]}""")
    vLit("""json_parse('"x"')""", "\"x\"")
    vLit("json_parse('null')", "null")
    vErr("json_parse('INVALID')", "Cannot convert value to JSON")
    vErr("""json_parse('"x": 1')""", "Cannot convert value to JSON")
    vErr("json_parse('{}{')", "Cannot convert value to JSON")
    vErr("""json_parse('{} "a"')""", "Cannot convert value to JSON")
    vErr("json_parse('{}abc')", "Cannot convert value to JSON")
    vErr("json_parse('')", "Cannot convert value to JSON")
    vLit("""json_format(json_parse('["a", "b"]'))""", """["a","b"]""")
    vNull("json_parse(CAST(NULL AS VARCHAR))")
  }

  // ------------------------------------------------------------------
  test("date_trunc / timestamp vectors at micros precision (timestamp/TestDateTrunc.java, TestTimestamp.java)") {
    // the reference parameterizes precision 0..12; this engine's
    // timestamps are micros (SURVEY §1.3), so the in-scope subset
    // collapses to one vector per unit
    v("date_trunc('year', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-01-01 00:00:00'")
    v("date_trunc('quarter', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-04-01 00:00:00'")
    v("date_trunc('month', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-01 00:00:00'")
    // ISO weeks start Monday (2020-05-10 is a Sunday)
    v("date_trunc('week', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-04 00:00:00'")
    v("date_trunc('day', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-10 00:00:00'")
    v("date_trunc('hour', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-10 12:00:00'")
    v("date_trunc('minute', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-10 12:34:00'")
    v("date_trunc('second', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-10 12:34:56'")
    v("date_trunc('millisecond', TIMESTAMP '2020-05-10 12:34:56.123456')",
      "TIMESTAMP '2020-05-10 12:34:56.123'")
    // timestamp comparisons / BETWEEN at micros (TestTimestamp)
    vLit("TIMESTAMP '2020-05-10 12:34:56.123456' = TIMESTAMP '2020-05-10 12:34:56.123456'", "true")
    vLit("TIMESTAMP '2020-05-10 12:34:56.123456' < TIMESTAMP '2020-05-10 12:34:56.123457'", "true")
    vLit("TIMESTAMP '2020-05-10 12:34:56' BETWEEN TIMESTAMP '2020-05-10 00:00:00' AND TIMESTAMP '2020-05-11 00:00:00'", "true")
    v("greatest(TIMESTAMP '2020-05-10 12:34:56', TIMESTAMP '2020-05-10 12:34:55')",
      "TIMESTAMP '2020-05-10 12:34:56'")
  }

  // ------------------------------------------------------------------
  test("transform lambda vectors (TestArrayTransformFunction.java:43-235)") {
    v("transform(ARRAY[5, 6], x -> 9)", "ARRAY[9, 9]")
    v("transform(ARRAY[5, 6], x -> x + 1)", "ARRAY[6, 7]")
    v("transform(ARRAY[25, 26], x -> x + 1)", "ARRAY[26, 27]")
    v("transform(ARRAY[25, 26], x -> x + 1.0E0)", "ARRAY[26.0E0, 27.0E0]")
    v("transform(ARRAY[25, 26], x -> x = 25)", "ARRAY[true, false]")
    v("transform(ARRAY[25, 26], x -> ARRAY[x + 1])", "ARRAY[ARRAY[26], ARRAY[27]]")
    v("transform(ARRAY[25.6E0, 27.3E0], x -> CAST(x AS BIGINT))",
      "ARRAY[BIGINT '26', BIGINT '27']")
    v("transform(ARRAY[25.6E0, 27.3E0], x -> CAST(x AS VARCHAR))",
      "ARRAY['25.6', '27.3']")
    v("transform(ARRAY[], x -> true)", "ARRAY[]")
    v("transform(CAST(ARRAY[] AS array(integer)), x -> x + 1)",
      "CAST(ARRAY[] AS array(integer))")
    vNull("transform(CAST(NULL AS array(integer)), x -> x + 1)")
    v("transform(ARRAY[25, NULL, 27], x -> x + 1)", "ARRAY[26, NULL, 28]")
  }

  // ------------------------------------------------------------------
  test("LIKE engine vectors (TestLikeFunctions.java:69-200)") {
    // varchar basics
    vLit("'foob' LIKE 'f%b__'", "false")
    vLit("'foob' LIKE 'f%b'", "true")
    vLit("CAST('foo' AS varchar(6)) LIKE 'foo '", "false")
    vLit("CAST('foo ' AS varchar(6)) LIKE 'foo '", "true")
    vLit("CAST('foo' AS varchar(6)) LIKE 'foo___'", "false")
    vLit("CAST('foo' AS varchar(6)) LIKE 'foo%'", "true")
    vLit("CAST('foo' AS varchar(6)) LIKE CAST('foo' AS varchar(6))", "true")
    // CHAR(n) values match LIKE against their SPACE-PADDED form in
    // the reference (likeChar). This engine's documented type mapping
    // collapses CHAR(n) to unpadded STRING (docs/MIGRATION.md), so
    // the padded value is expressed explicitly — same matcher
    // vectors, engine-expressible padding
    vLit("rpad('foo', 6, ' ') LIKE 'foo'", "false")
    vLit("rpad('foo', 6, ' ') LIKE 'fo_'", "false")
    vLit("rpad('foo', 6, ' ') LIKE 'fo%'", "true")
    vLit("rpad('foo', 6, ' ') LIKE '%foo'", "false")
    vLit("rpad('foo', 6, ' ') LIKE '_oo'", "false")
    vLit("rpad('foob', 6, ' ') LIKE 'f%b__'", "true")
    vLit("rpad('foob', 7, ' ') LIKE 'f%b__'", "false")
    vLit("rpad('foo', 3, ' ') LIKE 'foo'", "true")
    vLit("rpad('foo', 3, ' ') LIKE 'fob'", "false")
    vLit("rpad('foo', 6, ' ') LIKE 'foo   '", "true")
    vLit("rpad('foo', 6, ' ') LIKE 'foo __'", "true")
    vLit("rpad('foo', 6, ' ') LIKE '%%%%%%'", "true")
    vLit("rpad('foo', 3, ' ') LIKE '%%foo'", "true")
    vLit("rpad('foo', 6, ' ') LIKE '_______'", "false")
    // ESCAPE
    vLit("'f_.' LIKE 'f#_#_' ESCAPE '#'", "false")
    vLit("'f__' LIKE 'f#_#_' ESCAPE '#'", "true")
  }
}
