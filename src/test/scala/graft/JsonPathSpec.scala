package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonPathEval
import graft.functions.JsonPathEval.{PathEvalError, UnsupportedPathError}

/** SQL/JSON 2016 path evaluator conformance — the reference's own
  * `TestJsonPathEvaluator` vectors (core/trino-main/src/test/java/io/
  * trino/json/TestJsonPathEvaluator.java) replayed in JSON-literal
  * form, plus the function-level ON EMPTY / ON ERROR contracts from
  * TestJsonValue/Query/ExistsFunction. */
class JsonPathSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def seq(doc: String, path: String): Vector[String] =
    JsonPathEval.evaluate(mapper.readTree(doc), JsonPathEval.parse(path))
      .map(_.toString)

  private def evalErr(doc: String, path: String): String =
    intercept[PathEvalError](seq(doc, path)).getMessage

  test("member accessor: lax unwrap, missing-member lax vs strict") {
    // testMemberAccessor: lax unwraps the array of objects
    val arr = """[{"key1":"first","key2":true},{"key1":1,"key2":null}]"""
    assert(seq(arr, "lax $.key2") == Vector("true", "null"))
    assert(seq(arr, "lax $[*].key2") == Vector("true", "null"))
    // key not found: lax suppresses, strict raises
    val obj = """{"key1":"bound_value","key2":null}"""
    assert(seq(obj, "lax $.wrong_key").isEmpty)
    assert(evalErr(obj, "strict $.wrong_key")
      .contains("missing member 'wrong_key'"))
    // key missing in ONE of several objects — lax keeps the hits
    val partial = """[{"key1":"first","key2":true},{"key3":1,"key4":null}]"""
    assert(seq(partial, "lax $[*].key2") == Vector("true"))
    assert(evalErr(partial, "strict $[*].key2").contains("missing member"))
    // wildcard member
    assert(seq(obj, "lax $.*") == Vector("\"bound_value\"", "null"))
    // quoted member name
    assert(seq("""{"a b":5}""", "lax $.\"a b\"") == Vector("5"))
  }

  test("array accessor: ranges, last, bounds lax vs strict, wrap") {
    val five = """["first","second","third","fourth","fifth"]"""
    assert(seq(five, "lax $[*]").length == 5)
    assert(seq(five, "lax $[0]") == Vector("\"first\""))
    assert(seq(five, "lax $[0 to 1]") == Vector("\"first\"", "\"second\""))
    // multiple overlapping subscripts, in order
    assert(seq(five, "lax $[3 to 4, 1 to 2, 0]") ==
      Vector("\"fourth\"", "\"fifth\"", "\"second\"", "\"third\"", "\"first\""))
    // last variable
    assert(seq(five, "lax $[last]") == Vector("\"fifth\""))
    assert(seq("""["element",7.0,null]""", "lax $[1 to last]") ==
      Vector("7.0", "null"))
    // last with no enclosing array raises
    assert(intercept[PathEvalError](seq("1", "lax last")).getMessage
      .contains("no enclosing array"))
    // out of bounds: lax → empty / clipped; strict → structural error
    assert(seq(five, "lax $[100]").isEmpty)
    assert(seq(five, "lax $[3 to 100]") == Vector("\"fourth\"", "\"fifth\""))
    assert(seq(five, "lax $[3 to 2]").isEmpty)
    assert(evalErr(five, "strict $[100]").contains("invalid array subscript"))
    assert(evalErr(five, "strict $[3 to 100]").contains("invalid array subscript"))
    assert(evalErr(five, "strict $[3 to 2]").contains("invalid array subscript"))
    // non-array: lax wraps to singleton, strict raises
    assert(seq("-5", "lax $[0]") == Vector("-5"))
    assert(evalErr("-5", "strict $[0]").contains("Expected: ARRAY"))
    // nested: wildcard then range over each inner array
    assert(seq("""[["first","second","third"],[1,2,3]]""", "lax $[*][1 to 2]") ==
      Vector("\"second\"", "\"third\"", "2", "3"))
  }

  test("filter: keeps true, drops false and unknown; lax unwrap") {
    val nums = "[1.5, 2, 5, 10]"
    assert(seq(nums, "lax $[*]?(@ > 3)") == Vector("5", "10"))
    assert(seq(nums, "lax $?(@ > 3)") == Vector("5", "10")) // auto-unwrap
    // unknown (incomparable) drops the item
    assert(seq("[5]", "lax $[*]?(@ < true)").isEmpty)
    // @ outside a filter raises
    assert(intercept[PathEvalError](seq("1", "lax @")).getMessage
      .contains("no enclosing filter"))
    // nested member predicate
    val objs = """[{"v":1},{"v":7},{"w":3}]"""
    assert(seq(objs, "lax $[*]?(@.v > 2)") == Vector("""{"v":7}"""))
    assert(seq(objs, "lax $[*]?(exists(@.w))") == Vector("""{"w":3}"""))
    // lax: missing member → empty sequence → comparison is FALSE;
    // strict: missing member → error → UNKNOWN, surfaced by IS UNKNOWN
    assert(seq(objs, "lax $[*]?((@.v > 0) is unknown)").isEmpty)
    assert(seq(objs, "strict $[*]?((@.v > 0) is unknown)") == Vector("""{"w":3}"""))
  }

  test("comparison semantics: nulls, non-scalars, cross-type unknown") {
    // null == null → true; orderings with null → false; null != x → true
    assert(seq("[null]", "lax $[*]?(@ == null)") == Vector("null"))
    assert(seq("[null]", "lax $[*]?(@ < 1)").isEmpty) // false, not unknown
    assert(seq("[5]", "lax $[*]?(@ != null)") == Vector("5"))
    // arrays/objects only compare with null → otherwise unknown (drops)
    assert(seq("""[{"a":[1]}]""", "strict $[*]?(@.a == @.a)").isEmpty)
    // strings compare lexicographically; booleans false < true
    assert(seq("""["xyz"]""", "lax $[*]?(@ > \"abc\")") == Vector("\"xyz\""))
    assert(seq("[true]", "lax $[*]?(@ > false)").nonEmpty)
    // number cross-representation equality: 1 == 1.0
    assert(seq("[1]", "lax $[*]?(@ == 1.0)") == Vector("1"))
  }

  test("predicate connectives: Kleene && || !") {
    val d = "[5]"
    assert(seq(d, "lax $[*]?(@ > 1 && @ < 10)") == Vector("5"))
    // false && unknown = false (drops); unknown && true = unknown (drops)
    assert(seq(d, "lax $[*]?(@ > 9 && @ < true)").isEmpty)
    assert(seq(d, "lax $[*]?(@ < true && @ > 1)").isEmpty)
    // unknown || true = true
    assert(seq(d, "lax $[*]?(@ < true || @ > 1)") == Vector("5"))
    assert(seq(d, "lax $[*]?(!(@ > 9))") == Vector("5"))
  }

  test("starts with / like_regex") {
    val words = """["alpha","beta","alps"]"""
    assert(seq(words, "lax $[*]?(@ starts with \"alp\")") ==
      Vector("\"alpha\"", "\"alps\""))
    assert(seq(words, "lax $[*]?(@ like_regex \"^b.ta$\")") == Vector("\"beta\""))
    assert(seq(words, "lax $[*]?(@ like_regex \"ALP\" flag \"i\")") ==
      Vector("\"alpha\"", "\"alps\""))
    // like_regex is substring-match (XQuery fn:matches semantics)
    assert(seq(words, "lax $[*]?(@ like_regex \"lph\")") == Vector("\"alpha\""))
  }

  test("arithmetic: decimal-exact, singleton rule, division by zero") {
    assert(seq("""{"a":5}""", "lax $.a + 3") == Vector("8"))
    assert(seq("""{"a":5}""", "lax -$.a") == Vector("-5"))
    assert(seq("""{"a":17.0}""", "lax $.a + 1") == Vector("18.0"))
    assert(seq("""{"a":7}""", "lax $.a % 3") == Vector("1"))
    assert(seq("""{"a":7}""", "lax $.a * 2 + 1") == Vector("15"))
    // lax unwraps a singleton array operand (testArithmeticBinary)
    assert(seq("[-5]", "lax $ * 3") == Vector("-15"))
    // non-singleton operand raises
    assert(evalErr("[1,2]", "lax $[*] + 0").contains("singleton"))
    // unary applies per item, binary does not
    assert(seq("[-1.0, 2, -3]", "lax -$[*]") == Vector("1.0", "-2", "3"))
    assert(evalErr("""{"a":1}""", "lax $.a / 0").contains("division by zero"))
    assert(evalErr("""{"a":true}""", "lax $.a + 1").contains("invalid operand types"))
  }

  test("item methods: type, size, abs, ceiling, floor, double, keyvalue") {
    assert(seq("-5", "lax $.type()") == Vector("\"number\""))
    assert(seq("\"x\"", "lax $.type()") == Vector("\"string\""))
    assert(seq("null", "lax $.type()") == Vector("\"null\""))
    assert(seq("[1]", "lax $.type()") == Vector("\"array\"")) // no unwrap
    assert(seq("{}", "lax $.type()") == Vector("\"object\""))
    // size: arrays → length; non-array lax → 1, strict → error; no unwrap
    assert(seq("""[1.5,[true,false]]""", "lax $[*].size()") == Vector("1", "2"))
    assert(seq("-5", "lax $.size()") == Vector("1"))
    assert(seq("null", "lax $.size()") == Vector("1"))
    assert(evalErr("-5", "strict $.size()").contains("Expected: ARRAY"))
    // numeric methods: lax unwraps; type mismatch raises in BOTH modes
    assert(seq("[-1.0, 2, -3]", "lax $.abs()") == Vector("1.0", "2", "3"))
    assert(seq("17.3", "lax $.ceiling()") == Vector("18"))
    assert(seq("17.3", "lax $.floor()") == Vector("17"))
    assert(seq("5", "lax $.double()") == Vector("5.0"))
    assert(seq("\"2.5\"", "lax $.double()") == Vector("2.5"))
    assert(evalErr("null", "lax $.abs()").contains("Expected: NUMBER"))
    // keyvalue: object → name/value/id rows; non-object raises
    assert(seq("""{"a":1,"b":"x"}""", "lax $.keyvalue()") ==
      Vector("""{"name":"a","value":1,"id":0}""",
        """{"name":"b","value":"x","id":0}"""))
    assert(evalErr("null", "lax $.keyvalue()").contains("Expected: OBJECT"))
  }

  test("datetime() item method: ISO defaults, templates, typed semantics") {
    // ISO defaults pick the most specific kind (SQL:2016 §9.40); the
    // reference parses the method (JsonPath.g4:51) but its evaluator
    // raises (PathEvaluationVisitor.java:646) — capability add here
    assert(seq("""{"d":"2024-02-29"}""", "lax $.d.datetime()") ==
      Vector("\"2024-02-29\""))
    assert(seq("""{"t":"13:05:07"}""", "lax $.t.datetime()") ==
      Vector("\"13:05:07\""))
    assert(seq("""{"ts":"2024-02-29 13:05:07"}""", "lax $.ts.datetime()") ==
      Vector("\"2024-02-29T13:05:07\""))
    assert(seq("""{"z":"2024-02-29T13:05:07+09:00"}""", "lax $.z.datetime()") ==
      Vector("\"2024-02-29T13:05:07+09:00\""))
    // type() reports the datetime kind
    assert(seq("""{"d":"2024-02-29"}""", "lax $.d.datetime().type()") ==
      Vector("\"date\""))
    assert(seq("""{"ts":"2024-02-29 13:05:07"}""", "lax $.ts.datetime().type()") ==
      Vector("\"timestamp without time zone\""))
    // templates: YYYY/MM/DD + HH24:MI:SS + fraction + offset
    assert(seq("""{"d":"29/02/2024"}""", "lax $.d.datetime(\"DD/MM/YYYY\")") ==
      Vector("\"2024-02-29\""))
    assert(seq("""{"ts":"2024-02-29 13.05.07"}""",
      "lax $.ts.datetime(\"YYYY-MM-DD HH24.MI.SS\")") ==
      Vector("\"2024-02-29T13:05:07\""))
    assert(seq("""{"z":"2024-02-29 13:05:07+09:00"}""",
      "lax $.z.datetime(\"YYYY-MM-DD HH24:MI:SSTZH:TZM\")") ==
      Vector("\"2024-02-29T13:05:07+09:00\""))
    // chronological comparison in filters (lexicographic would also
    // put 2024-1-9 < 2024-1-10 wrong if unpadded — parse enforces pad)
    assert(seq("""[{"d":"2024-01-09"},{"d":"2024-01-10"},{"d":"2023-12-31"}]""",
      "lax $[*] ? (@.d.datetime() > \"2024-01-01\".datetime()) .d") ==
      Vector("\"2024-01-09\"", "\"2024-01-10\""))
    // cross-category comparison is UNKNOWN → filter drops
    assert(seq("""[{"d":"2024-01-09"}]""",
      "lax $[*] ? (@.d.datetime() > 5) .d").isEmpty)
    // datetime vs plain string is UNKNOWN too
    assert(seq("""[{"d":"2024-01-09"}]""",
      "lax $[*] ? (@.d.datetime() > \"2024\") .d").isEmpty)
    // errors stay loud: non-text input, unparseable text, bad template
    assert(evalErr("""{"d":5}""", "strict $.d.datetime()")
      .contains("Expected: TEXT"))
    assert(evalErr("""{"d":"not a date"}""", "lax $.d.datetime()")
      .contains("cannot parse"))
    assert(evalErr("""{"d":"2024-02-29"}""", "lax $.d.datetime(\"QQ\")")
      .contains("unsupported datetime template"))
    // lax unwraps arrays before the method, like the other item methods
    assert(seq("""{"a":["2024-01-01","2024-06-01"]}""",
      "lax $.a.datetime().type()") == Vector("\"date\"", "\"date\""))
  }

  test("unsupported constructs raise loudly, never NULL") {
    // named variables parse (PASSING surface, r14) — but referencing
    // one in a no-PASSING call form stays a LOUD error
    val p = JsonPathEval.parse("lax $foo.bar")
    assertThrows[UnsupportedPathError](
      JsonPathEval.evaluate(
        new com.fasterxml.jackson.databind.ObjectMapper().readTree("{}"), p))
    assertThrows[UnsupportedPathError](JsonPathEval.parse("lax $.a !!"))
    assertThrows[UnsupportedPathError](JsonPathEval.parse("lax $.a.unknown_method()"))
    // ...and through the function wrappers too (not ON ERROR'd)
    assertThrows[UnsupportedPathError](
      graft.functions.GraftFunctions.jsonValue("{}", "lax $bad"))
  }

  test("function-level ON EMPTY / ON ERROR contracts") {
    import graft.functions.GraftFunctions._
    val doc = """{"a":{"b":3,"c":[1,2,9]},"s":"txt","n":null}"""
    // json_value: scalar → text; container/multi/error → NULL
    assert(jsonValue(doc, "lax $.a.b") == "3")
    assert(jsonValue(doc, "lax $.a") == null) // container
    assert(jsonValue(doc, "lax $.a.c[*]") == null) // multi-item
    assert(jsonValue(doc, "lax $.missing") == null) // empty
    assert(jsonValue(doc, "strict $.missing") == null) // error → NULL
    assert(jsonValue(doc, "lax $.n") == null) // JSON null
    assert(jsonValue(doc, "lax $.a.c[last]") == "9")
    assert(jsonValue(doc, "lax $.a.c[*]?(@ > 5)") == "9")
    assert(jsonValue(doc, "lax $.a.c.size()") == "3")
    // json_exists: FALSE ON ERROR
    assert(jsonExists(doc, "lax $.n") == true) // JSON null still exists
    assert(jsonExists(doc, "lax $.missing") == false)
    assert(jsonExists(doc, "strict $.missing") == false) // error → FALSE
    assert(jsonExists(doc, "lax $.a.c[*]?(@ > 100)") == false)
    assert(jsonExists(doc, "lax $.a.c[*]?(@ > 5)") == true)
    // json_query: single container/scalar rendered as JSON text
    assert(jsonQuery(doc, "lax $.a.c") == "[1,2,9]")
    assert(jsonQuery(doc, "lax $.s") == "\"txt\"")
    assert(jsonQuery(doc, "lax $.a.c[*]") == null) // multi without wrapper
    assert(jsonQuery(doc, "lax $.missing") == null)
  }
}
