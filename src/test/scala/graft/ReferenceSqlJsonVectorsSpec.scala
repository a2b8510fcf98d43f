package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference engine's SQL/JSON *function-level* conformance
  * corpora, replayed verbatim through `Dialect.translate`:
  *
  *  - `core/trino-main/src/test/java/io/trino/sql/query/
  *    TestJsonExistsFunction.java` (ON ERROR behaviors, FORMAT JSON
  *    [ENCODING], PASSING incl. case-sensitive names and JSON
  *    parameters, null inputs)
  *  - `TestJsonValueFunction.java` (ON EMPTY/ON ERROR, RETURNING incl.
  *    cast-failure routing, multi-item/non-scalar errors)
  *  - `TestJsonObjectFunction.java` (KEY/VALUE spellings, NULL/ABSENT
  *    ON NULL, UNIQUE KEYS, FORMAT JSON values, RETURNING varbinary
  *    ENCODING)
  *  - `TestJsonArrayFunction.java` (element forms, FORMAT JSON
  *    validation/minification, RETURNING encodings)
  *
  * Both sides run through the engine (like the reference's
  * `assertThat(query).matches(values)`), so padding/typing details
  * compare engine-consistently. Documented replay deltas:
  * object-member ORDER is this engine's insertion order (the
  * reference's own comment calls the order arbitrary); error
  * MESSAGES assert this engine's stable fragments; the
  * INTERVAL-typed PASSING parameter and the HyperLogLog value
  * vectors are out of scope (no interval→varchar JSON rendering /
  * no HLL type here).
  */
class ReferenceSqlJsonVectorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var vectorCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-sqljson-vectors", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"replayed $vectorCount reference SQL/JSON vectors")
    if (spark != null) spark.stop()
  }

  private def runQ(sql: String): DataFrame =
    spark.sql(graft.sqlcompat.Dialect.translate(sql))

  private def canonVal(v: Any): String = v match {
    case null => "ø"
    case b: Array[Byte] => b.map("%02X".format(_)).mkString
    case n: Number => n.toString
    case other => other.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => canonVal(r.get(i))).mkString("|"))

  private def v(query: String, expected: String): Unit = {
    vectorCount += 1
    val got = rows(runQ(query)).sorted
    val want = rows(runQ(expected)).sorted
    assert(got == want, s"\nquery:    $query\ngot:      $got\nexpected: $want")
  }

  private def vErr(query: String, frag: String): Unit = {
    vectorCount += 1
    val e = intercept[Throwable] { runQ(query).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains(frag)),
      s"\nwrong error for: $query\ngot: ${msgs(e).mkString(" | ")}")
  }

  private def vErrAny(query: String): Unit = {
    vectorCount += 1
    intercept[Throwable] { runQ(query).collect() }
  }

  private val INPUT = """["a", "b", "c"]"""
  private val BAD = "[..."

  private def hex(s: String, cs: String): String =
    "X'" + s.getBytes(java.nio.charset.Charset.forName(cs))
      .map("%02X".format(_)).mkString + "'"

  // ================================== TestJsonExistsFunction.java:54

  test("json_exists ON ERROR behaviors (TestJsonExistsFunction.java:54)") {
    v(s"SELECT json_exists('$INPUT', 'lax $$[1]')", "VALUES true")
    v(s"SELECT json_exists('$INPUT', 'strict $$[1]')", "VALUES true")
    // lax structural error suppressed -> empty -> false
    v(s"SELECT json_exists('$INPUT', 'lax $$[100]')", "VALUES false")
    // strict structural error -> ON ERROR (default FALSE)
    v(s"SELECT json_exists('$INPUT', 'strict $$[100]')", "VALUES false")
    v(s"SELECT json_exists('$INPUT', 'strict $$[100]' TRUE ON ERROR)", "VALUES true")
    v(s"SELECT json_exists('$INPUT', 'strict $$[100]' FALSE ON ERROR)", "VALUES false")
    v(s"SELECT json_exists('$INPUT', 'strict $$[100]' UNKNOWN ON ERROR)",
      "VALUES cast(null AS boolean)")
    vErr(s"SELECT json_exists('$INPUT', 'strict $$[100]' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
  }

  test("json_exists input formats (TestJsonExistsFunction.java:96)") {
    v(s"SELECT json_exists('$INPUT' FORMAT JSON, 'lax $$[1]')", "VALUES true")
    // ENCODING on a character string is an analysis error
    vErrAny(s"SELECT json_exists('$INPUT' FORMAT JSON ENCODING UTF8, 'lax $$[1]')")
    // binary input: bare, FORMAT JSON, and each supported ENCODING
    v(s"SELECT json_exists(${hex(INPUT, "UTF-8")} FORMAT JSON, 'lax $$[1]')",
      "VALUES true")
    v(s"SELECT json_exists(${hex(INPUT, "UTF-8")} FORMAT JSON ENCODING UTF8, 'lax $$[1]')",
      "VALUES true")
    v(s"SELECT json_exists(${hex(INPUT, "UTF-16LE")} FORMAT JSON ENCODING UTF16, 'lax $$[1]')",
      "VALUES true")
    v(s"SELECT json_exists(${hex(INPUT, "UTF-32LE")} FORMAT JSON ENCODING UTF32, 'lax $$[1]')",
      "VALUES true")
    // the encoding must match the actual data
    vErr(s"SELECT json_exists(${hex(INPUT, "UTF-32LE")} FORMAT JSON ENCODING UTF8, " +
      "'lax $[1]' ERROR ON ERROR)", "ON ERROR behavior is ERROR")
  }

  test("json_exists input conversion errors (TestJsonExistsFunction.java:150)") {
    v(s"SELECT json_exists('$BAD', 'lax $$[1]' FALSE ON ERROR)", "VALUES false")
    v(s"SELECT json_exists('$BAD', 'strict $$[1]' TRUE ON ERROR)", "VALUES true")
    v(s"SELECT json_exists('$BAD', 'strict $$[1]' UNKNOWN ON ERROR)",
      "VALUES cast(null AS boolean)")
    vErr(s"SELECT json_exists('$BAD', 'strict $$[1]' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
  }

  test("json_exists PASSING clause (TestJsonExistsFunction.java:179)") {
    // case-sensitive parameter names: bare names canonicalize UPPER,
    // so $number is unbound -> loud analysis-style error
    vErr(s"SELECT json_exists('$INPUT', 'lax $$number + 1' PASSING 2 AS number)",
      "no value passed for parameter number")
    v(s"""SELECT json_exists('$INPUT', 'lax $$number + 1' PASSING 5 AS "number")""",
      "VALUES true")
    // JSON parameter
    v(s"""SELECT json_exists('$INPUT', 'lax $$array[0]' PASSING '[1, 2, 3]' FORMAT JSON AS "array")""",
      "VALUES true")
    // malformed JSON parameter -> ON ERROR (default FALSE)
    v(s"""SELECT json_exists('$INPUT', 'lax $$array[0]' PASSING '$BAD' FORMAT JSON AS "array")""",
      "VALUES false")
    vErr(s"""SELECT json_exists('$INPUT', 'lax $$array[0]' PASSING '$BAD' FORMAT JSON AS "array" ERROR ON ERROR)""",
      "ON ERROR behavior is ERROR")
    // array index out of bounds
    v(s"""SELECT json_exists('$INPUT', 'lax $$[$$number]' PASSING 5 AS "number")""",
      "VALUES false")
  }

  test("json_exists incorrect path + null inputs (TestJsonExistsFunction.java:213)") {
    // invalid path raises (never ON ERROR-suppressed)
    vErrAny(s"SELECT json_exists('$INPUT', 'certainly not a valid path' FALSE ON ERROR)")
    v("SELECT json_exists(null, 'lax $' FALSE ON ERROR)", "VALUES cast(null AS boolean)")
    // null SQL parameter -> JSON null (exists)
    v(s"""SELECT json_exists('$INPUT', 'lax $$var' PASSING null AS "var")""", "VALUES true")
    // null JSON parameter -> empty sequence (not exists)
    v(s"""SELECT json_exists('$INPUT', 'lax $$var' PASSING null FORMAT JSON AS "var")""",
      "VALUES false")
  }

  // ==================================== TestJsonValueFunction.java:54

  test("json_value ON EMPTY / ON ERROR behaviors (TestJsonValueFunction.java:54)") {
    v(s"SELECT json_value('$INPUT', 'lax $$[1]')", "VALUES VARCHAR 'b'")
    v(s"SELECT json_value('$INPUT', 'strict $$[1]')", "VALUES VARCHAR 'b'")
    // lax structural suppression: tail of the range survives
    v(s"SELECT json_value('$INPUT', 'lax $$[2 to 100]')", "VALUES VARCHAR 'c'")
    // strict structural error -> ON ERROR (default NULL)
    v(s"SELECT json_value('$INPUT', 'strict $$[100]')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'strict $$[100]' NULL ON ERROR)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'strict $$[100]' DEFAULT 'x' ON ERROR)",
      "VALUES VARCHAR 'x'")
    vErr(s"SELECT json_value('$INPUT', 'strict $$[100]' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
    // lax empty -> ON EMPTY (default NULL)
    v(s"SELECT json_value('$INPUT', 'lax $$[100]')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[100]' NULL ON EMPTY)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[100]' DEFAULT 'x' ON EMPTY)",
      "VALUES VARCHAR 'x'")
    vErr(s"SELECT json_value('$INPUT', 'lax $$[100]' ERROR ON EMPTY)",
      "ON EMPTY behavior is ERROR")
    // multiple items -> ON ERROR
    v(s"SELECT json_value('$INPUT', 'lax $$[0 to 2]')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[0 to 2]' NULL ON ERROR)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[0 to 2]' DEFAULT 'x' ON ERROR)",
      "VALUES VARCHAR 'x'")
    vErr(s"SELECT json_value('$INPUT', 'lax $$[0 to 2]' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
  }

  test("json_value input formats + conversion errors (TestJsonValueFunction.java:137)") {
    v(s"SELECT json_value('$INPUT' FORMAT JSON, 'lax $$[1]')", "VALUES VARCHAR 'b'")
    vErrAny(s"SELECT json_value('$INPUT' FORMAT JSON ENCODING UTF8, 'lax $$[1]')")
    v(s"SELECT json_value(${hex(INPUT, "UTF-8")} FORMAT JSON, 'lax $$[1]')",
      "VALUES VARCHAR 'b'")
    v(s"SELECT json_value(${hex(INPUT, "UTF-8")} FORMAT JSON ENCODING UTF8, 'lax $$[1]')",
      "VALUES VARCHAR 'b'")
    v(s"SELECT json_value(${hex(INPUT, "UTF-16LE")} FORMAT JSON ENCODING UTF16, 'lax $$[1]')",
      "VALUES VARCHAR 'b'")
    v(s"SELECT json_value(${hex(INPUT, "UTF-32LE")} FORMAT JSON ENCODING UTF32, 'lax $$[1]')",
      "VALUES VARCHAR 'b'")
    vErr(s"SELECT json_value(${hex(INPUT, "UTF-32LE")} FORMAT JSON ENCODING UTF8, " +
      "'lax $[1]' ERROR ON ERROR)", "ON ERROR behavior is ERROR")
    // malformed input -> ON ERROR
    v(s"SELECT json_value('$BAD', 'lax $$[1]')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$BAD', 'lax $$[1]' NULL ON ERROR)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$BAD', 'lax $$[1]' DEFAULT 'x' ON ERROR)",
      "VALUES VARCHAR 'x'")
    vErr(s"SELECT json_value('$BAD', 'lax $$[1]' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
  }

  test("json_value PASSING clause (TestJsonValueFunction.java:211)") {
    vErr(s"SELECT json_value('$INPUT', 'lax $$number + 1' PASSING 2 AS number)",
      "no value passed for parameter number")
    v(s"""SELECT json_value('$INPUT', 'lax $$number + 1' PASSING 5 AS "number")""",
      "VALUES VARCHAR '6'")
    v(s"""SELECT json_value('$INPUT', 'lax $$array[0]' PASSING '[1, 2, 3]' FORMAT JSON AS "array")""",
      "VALUES VARCHAR '1'")
    v(s"""SELECT json_value('$INPUT', 'lax $$array[0]' PASSING '$BAD' FORMAT JSON AS "array")""",
      "VALUES cast(null AS varchar)")
    vErr(s"""SELECT json_value('$INPUT', 'lax $$array[0]' PASSING '$BAD' FORMAT JSON AS "array" ERROR ON ERROR)""",
      "ON ERROR behavior is ERROR")
    v(s"""SELECT json_value('$INPUT', 'lax $$[$$number]' PASSING 5 AS "number")""",
      "VALUES cast(null AS varchar)")
    // UUID parameter casts to varchar
    v(s"""SELECT json_value('$INPUT', 'lax $$parameter' PASSING UUID '12151fd2-7586-11e9-8f9e-2a86e4085a59' AS "parameter")""",
      "VALUES cast('12151fd2-7586-11e9-8f9e-2a86e4085a59' AS varchar)")
  }

  test("json_value RETURNING types (TestJsonValueFunction.java:253)") {
    v(s"SELECT json_value('$INPUT', 'lax 1')", "VALUES VARCHAR '1'")
    v(s"SELECT json_value('$INPUT', 'lax true')", "VALUES VARCHAR 'true'")
    v(s"SELECT json_value('$INPUT', 'lax null')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[1]' RETURNING char(10))",
      "VALUES cast('b' AS char(10))")
    // value does not fit the returned type -> ON ERROR
    v(s"SELECT json_value('$INPUT', 'lax 1000' RETURNING tinyint)",
      "VALUES cast(null AS tinyint)")
    v(s"SELECT json_value('$INPUT', 'lax 1000' RETURNING tinyint DEFAULT TINYINT '-1' ON ERROR)",
      "VALUES TINYINT '-1'")
    // default value cast to the returned type
    v(s"SELECT json_value('$INPUT', 'lax 1000000000000 * 1000000000000' RETURNING bigint DEFAULT TINYINT '-1' ON ERROR)",
      "VALUES BIGINT '-1'")
  }

  test("json_value non-scalar results + null inputs (TestJsonValueFunction.java:290)") {
    v(s"SELECT json_value('$INPUT', 'lax $$')", "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$' NULL ON ERROR)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$' DEFAULT 'x' ON ERROR)",
      "VALUES VARCHAR 'x'")
    vErr(s"SELECT json_value('$INPUT', 'lax $$' ERROR ON ERROR)",
      "ON ERROR behavior is ERROR")
    vErrAny(s"SELECT json_value('$INPUT', 'certainly not a valid path' NULL ON ERROR)")
    v("SELECT json_value(null, 'lax $' NULL ON ERROR)", "VALUES cast(null AS varchar)")
    v(s"""SELECT json_value('$INPUT', 'lax $$var' PASSING null AS "var")""",
      "VALUES cast(null AS varchar)")
    v(s"""SELECT json_value('$INPUT', 'lax $$var' PASSING null FORMAT JSON AS "var" DEFAULT 'was empty...' ON EMPTY)""",
      "VALUES cast('was empty...' AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax 1' DEFAULT null ON EMPTY DEFAULT null ON ERROR)",
      "VALUES cast(1 AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax $$[100]' DEFAULT null ON EMPTY)",
      "VALUES cast(null AS varchar)")
    v(s"SELECT json_value('$INPUT', 'lax 1 + $$[0]' DEFAULT null ON ERROR)",
      "VALUES cast(null AS varchar)")
  }

  // =================================== TestJsonObjectFunction.java:51

  test("json_object member forms (TestJsonObjectFunction.java:51)") {
    v("SELECT json_object()", "VALUES VARCHAR '{}'")
    v("SELECT json_object('X' : 'Y')", """VALUES VARCHAR '{"X":"Y"}'""")
    v("SELECT json_object(KEY 'X' VALUE 'Y')", """VALUES VARCHAR '{"X":"Y"}'""")
    v("SELECT json_object('X' VALUE 'Y')", """VALUES VARCHAR '{"X":"Y"}'""")
    // member order: this engine preserves argument order (the
    // reference's own comment calls the order arbitrary)
    v("SELECT json_object('key_1' : 1, 'key_2' : 2)",
      """VALUES VARCHAR '{"key_1":1,"key_2":2}'""")
    vErr("SELECT json_object(CAST(null AS varchar) : 1)",
      "null value passed for JSON object key")
  }

  test("json_object null values + duplicate keys (TestJsonObjectFunction.java:94)") {
    v("SELECT json_object('key' : null NULL ON NULL)",
      """VALUES VARCHAR '{"key":null}'""")
    // NULL ON NULL is the object default
    v("SELECT json_object('key' : null)", """VALUES VARCHAR '{"key":null}'""")
    v("SELECT json_object('key' : null ABSENT ON NULL)", "VALUES VARCHAR '{}'")
    // duplicate keys: error regardless of the UNIQUE KEYS option
    vErr("SELECT json_object('key' : 1, 'key' : 2 WITHOUT UNIQUE KEYS)",
      "cannot construct a JSON object with duplicate key")
    vErr("SELECT json_object('key' : 1, 'key' : 2)",
      "cannot construct a JSON object with duplicate key")
    vErr("SELECT json_object('key' : 1, 'key' : 2 WITH UNIQUE KEYS)",
      "duplicate key passed to JSON_OBJECT function")
  }

  test("json_object FORMAT JSON values (TestJsonObjectFunction.java:135)") {
    v("""SELECT json_object('key' : '[ 1, true, "a", null ]' FORMAT JSON)""",
      """VALUES VARCHAR '{"key":[1,true,"a",null]}'""")
    v("SELECT json_object('key' : " + hex("""{"a" : 1}""", "UTF-16LE") +
      " FORMAT JSON ENCODING UTF16)",
      """VALUES VARCHAR '{"key":{"a":1}}'""")
    vErr(s"SELECT json_object('key' : '$BAD' FORMAT JSON)",
      "conversion to JSON failed")
    // duplicate key inside the formatted value: one entry retained
    v("""SELECT json_object('key' : '{"a" : 1, "a" : 1}' FORMAT JSON)""",
      """VALUES VARCHAR '{"key":{"a":1}}'""")
    v("""SELECT json_object('key' : '{"a" : 1, "a" : 1}' FORMAT JSON WITHOUT UNIQUE KEYS)""",
      """VALUES VARCHAR '{"key":{"a":1}}'""")
    vErr("""SELECT json_object('key' : '{"a" : 1, "a" : 1}' FORMAT JSON WITH UNIQUE KEYS)""",
      "WITH UNIQUE KEYS behavior is not supported")
  }

  test("json_object value types + nesting + output (TestJsonObjectFunction.java:168)") {
    v("SELECT json_object('key' : 1e0)", """VALUES VARCHAR '{"key":1.0}'""")
    v("SELECT json_object('key' : UUID '12151fd2-7586-11e9-8f9e-2a86e4085a59')",
      """VALUES VARCHAR '{"key":"12151fd2-7586-11e9-8f9e-2a86e4085a59"}'""")
    v("SELECT json_object('key' : DATE '2001-01-31')",
      """VALUES VARCHAR '{"key":"2001-01-31"}'""")
    v("SELECT json_object('key' : json_object('a' : 1))",
      """VALUES VARCHAR '{"key":{"a":1}}'""")
    v("SELECT json_object((SELECT 'key') : (SELECT 1))",
      """VALUES VARCHAR '{"key":1}'""")
    v("SELECT json_object('key' : 1 RETURNING varchar)",
      """VALUES VARCHAR '{"key":1}'""")
    v("SELECT json_object('key' : 1 RETURNING varchar FORMAT JSON)",
      """VALUES VARCHAR '{"key":1}'""")
    v("SELECT json_object('key' : 1 RETURNING varchar(100))",
      """VALUES CAST('{"key":1}' AS varchar(100))""")
    // varbinary output in each encoding
    v("SELECT json_object('key' : 1 RETURNING varbinary FORMAT JSON ENCODING UTF8)",
      "VALUES " + hex("""{"key":1}""", "UTF-8"))
    v("SELECT json_object('key' : 1 RETURNING varbinary FORMAT JSON ENCODING UTF16)",
      "VALUES " + hex("""{"key":1}""", "UTF-16LE"))
    v("SELECT json_object('key' : 1 RETURNING varbinary FORMAT JSON ENCODING UTF32)",
      "VALUES " + hex("""{"key":1}""", "UTF-32LE"))
  }

  // ==================================== TestJsonArrayFunction.java:50

  test("json_array element forms (TestJsonArrayFunction.java:50)") {
    v("SELECT json_array()", "VALUES VARCHAR '[]'")
    v("SELECT json_array(1, true)", "VALUES VARCHAR '[1,true]'")
    // ABSENT ON NULL is the array default
    v("SELECT json_array(null)", "VALUES VARCHAR '[]'")
    v("SELECT json_array(null ABSENT ON NULL)", "VALUES VARCHAR '[]'")
    v("SELECT json_array(null NULL ON NULL)", "VALUES VARCHAR '[null]'")
    v("SELECT json_array(1, 1)", "VALUES VARCHAR '[1,1]'")
  }

  test("json_array FORMAT JSON elements (TestJsonArrayFunction.java:90)") {
    v("""SELECT json_array('{"a" : 1}' FORMAT JSON)""",
      """VALUES VARCHAR '[{"a":1}]'""")
    v("SELECT json_array(" + hex("""{"a" : 1}""", "UTF-16LE") +
      " FORMAT JSON ENCODING UTF16)",
      """VALUES VARCHAR '[{"a":1}]'""")
    vErr(s"SELECT json_array('$BAD' FORMAT JSON)", "conversion to JSON failed")
    v("""SELECT json_array('{"a" : 1, "a" : 1}' FORMAT JSON)""",
      """VALUES VARCHAR '[{"a":1}]'""")
  }

  test("json_array element types + output (TestJsonArrayFunction.java:119)") {
    v("SELECT json_array(1e0)", "VALUES VARCHAR '[1.0]'")
    v("SELECT json_array(UUID '12151fd2-7586-11e9-8f9e-2a86e4085a59')",
      """VALUES VARCHAR '["12151fd2-7586-11e9-8f9e-2a86e4085a59"]'""")
    v("SELECT json_array(DATE '2001-01-31')",
      """VALUES VARCHAR '["2001-01-31"]'""")
    v("SELECT json_array(json_array(1))", "VALUES VARCHAR '[[1]]'")
    v("SELECT json_array((SELECT 1))", "VALUES VARCHAR '[1]'")
    v("SELECT json_array(true RETURNING varchar)", "VALUES VARCHAR '[true]'")
    v("SELECT json_array(true RETURNING varchar FORMAT JSON)",
      "VALUES VARCHAR '[true]'")
    v("SELECT json_array(true RETURNING varchar(100))",
      "VALUES CAST('[true]' AS varchar(100))")
    v("SELECT json_array(true RETURNING varbinary FORMAT JSON ENCODING UTF8)",
      "VALUES " + hex("[true]", "UTF-8"))
    v("SELECT json_array(true RETURNING varbinary FORMAT JSON ENCODING UTF16)",
      "VALUES " + hex("[true]", "UTF-16LE"))
    v("SELECT json_array(true RETURNING varbinary FORMAT JSON ENCODING UTF32)",
      "VALUES " + hex("[true]", "UTF-32LE"))
  }
}
