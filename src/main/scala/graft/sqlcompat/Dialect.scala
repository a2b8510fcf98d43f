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

  /** Simple function renames (reference name → Spark name): same arity
    * and argument order on both sides, so a plain name rewrite is safe.
    * Anything needing argument surgery lives in the call-translation
    * pass below; reference functions with no sound Spark mapping (e.g.
    * numeric `truncate`) are deliberately absent and pass through
    * untouched so Spark reports them as unresolved. */
  private val renames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "approx_percentile" -> "percentile_approx",
    "strpos" -> "instr",
    "split_to_map" -> "str_to_map", // same (text, entryDelim, kvDelim) order
    "codepoint" -> "ascii",
    "json_extract_scalar" -> "get_json_object",
    "json_extract" -> "get_json_object", // same (json, jsonpath) order
    "bitwise_left_shift" -> "shiftleft",
    "bitwise_right_shift" -> "shiftrightunsigned", // reference shift is logical
    "bitwise_right_shift_arithmetic" -> "shiftright",
    "json_array_length" -> "json_array_length", // same
    "arbitrary" -> "any_value",
    "listagg" -> "listagg", // Spark 4 native
    "array_join" -> "array_join", // same
    "cardinality" -> "cardinality", // same
    "log" -> "log", // same signature (base, x)
    "is_nan" -> "isnan",
    "regexp_like" -> "regexp_like", // same in Spark 3.2+
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

    // Cross-segment pass: reference datetime calls whose FIRST argument
    // is a quoted unit literal — date_diff('day', a, b) → end-start in
    // units ≡ Spark timestampdiff(DAY, a, b). date_add('hour', n, ts) ≡
    // timestampadd(HOUR, n, ts) for sub-day units; day-or-coarser units
    // route to our graft_date_add expression instead, because the
    // reference returns DATE for DATE inputs while Spark's timestampadd
    // always widens to TIMESTAMP (graft_date_add preserves the input
    // type — functions/TrinoDateAdd.scala). The unit literal is its own
    // segment, so this must run before the per-segment renames.
    val units = Set("millisecond", "second", "minute", "hour",
      "day", "week", "month", "quarter", "year")
    val dayOrCoarser = Set("day", "week", "month", "quarter", "year")
    val callRe = "(?i)\\b(date_diff|date_add)(\\s*\\(\\s*)$".r
    var j = 0
    while (j + 1 < parts.length) {
      val (seg, isLit) = parts(j)
      val (lit, nextIsLit) = parts(j + 1)
      if (!isLit && nextIsLit && lit.length > 2) {
        val unit = lit.substring(1, lit.length - 1).toLowerCase
        callRe.findFirstMatchIn(seg).foreach { m =>
          val fn = m.group(1).toLowerCase
          if (units(unit)) {
            if (fn == "date_add" && dayOrCoarser(unit)) {
              // keep the unit as a string literal; graft_date_add takes it
              parts(j) = (seg.substring(0, m.start) + "graft_date_add" +
                m.group(2), false)
            } else {
              val to = if (fn == "date_diff") "timestampdiff" else "timestampadd"
              parts(j) = (seg.substring(0, m.start) + to + m.group(2), false)
              parts(j + 1) = (unit.toUpperCase, false) // bare unit identifier
            }
          }
        }
      }
      j += 1
    }

    // `expr AT TIME ZONE 'zone'` (reference grammar `SqlBase.g4:482`
    // AT_TIMEZONE): the zone is its own literal segment, so this is a
    // cross-segment rewrite — from_utc_timestamp(expr, 'zone') renders
    // the instant on the zone's wall clock (the session zone is UTC);
    // the zone id itself is not carried (SURVEY §1.3 type-loss note).
    // The operand may be a bare column/identifier, a function call, or
    // one parenthesized group. Documented limitation: operands with
    // nested parens or embedded string literals (e.g.
    // `date_trunc('day', ts) AT TIME ZONE 'X'`) do NOT match — the
    // expression passes through untranslated and Spark rejects the
    // AT TIME ZONE syntax loudly (asserted in DialectSpec), which is
    // safe-by-failure rather than a silent mistranslation.
    val atTzRe = ("(?i)([A-Za-z_][A-Za-z0-9_.]*\\s*\\([^()]*\\)|" +
      "[A-Za-z_][A-Za-z0-9_.]*|\\([^()]*\\))\\s+AT\\s+TIME\\s+ZONE\\s*$").r
    // operand is itself a datetime literal (`TIMESTAMP '…' AT TIME
    // ZONE '…'`): the operand's literal is its own segment too, so the
    // AT TIME ZONE keywords sit alone in a segment between two literals
    val atTzLitRe = "(?i)^\\s*AT\\s+TIME\\s+ZONE\\s*$".r
    // \b anchor: without it an identifier ending in ...timestamp (e.g.
    // `my_timestamp TIMESTAMP '…' AT TIME ZONE …`) would match and be
    // mangled into `my_from_utc_timestamp(timestamp …`.
    val tsKeywordRe = "(?i)\\b(TIMESTAMP|DATE)\\s*$".r
    var k = 0
    while (k + 2 < parts.length) {
      val (seg, isLit) = parts(k)
      if (!isLit && parts(k + 1)._2) {
        atTzRe.findFirstMatchIn(seg).foreach { m =>
          parts(k) = (seg.substring(0, m.start) +
            "from_utc_timestamp(" + m.group(1) + ", ", false)
          val (after, afterLit) = parts(k + 2)
          parts(k + 2) = (")" + after, afterLit)
        }
        if (k >= 2 && parts(k - 1)._2 && atTzLitRe.findFirstIn(seg).isDefined) {
          tsKeywordRe.findFirstMatchIn(parts(k - 2)._1).foreach { m =>
            parts(k - 2) = (parts(k - 2)._1.substring(0, m.start) +
              "from_utc_timestamp(" + m.group(1) + " ", false)
            parts(k) = (", ", false)
            val (after, afterLit) = parts(k + 2)
            parts(k + 2) = (")" + after, afterLit)
          }
        }
      }
      k += 1
    }

    // SQL/JSON 2016 RETURNING clause (grammar `SqlBase.g4:540-563`):
    // json_value(x, 'path' RETURNING t) → CAST(json_value(x, 'path')
    // AS t); the per-segment type-rename pass below then maps reference
    // type spellings (varchar→string …). Only the simple
    // trailing-RETURNING form is handled; ON EMPTY / ON ERROR clauses
    // pass through for Spark to reject loudly rather than mistranslate.
    val jsonFnRe = "(?i)\\b(json_value|json_query)(\\s*\\(\\s*[^()]*)$".r
    val returningRe = "(?i)^\\s*RETURNING\\s+([A-Za-z0-9_]+(?:\\s*\\(\\s*\\d+(?:\\s*,\\s*\\d+)?\\s*\\))?)\\s*\\)".r
    var m = 2
    while (m < parts.length) {
      val (after, afterIsLit) = parts(m)
      if (!afterIsLit && parts(m - 1)._2) {
        returningRe.findFirstMatchIn(after).foreach { rm =>
          // walk back to the segment holding the still-open
          // json_value(/json_query( call; intervening segments must be
          // string literals (the json/path arguments) or paren-free
          // glue (", ") so the parens we bracket are really this call's
          var j = m - 1
          while (j >= 0 && (parts(j)._2 ||
            (!parts(j)._1.contains("(") && !parts(j)._1.contains(")") &&
              jsonFnRe.findFirstMatchIn(parts(j)._1).isEmpty))) j -= 1
          if (j >= 0 && !parts(j)._2) {
            jsonFnRe.findFirstMatchIn(parts(j)._1).foreach { fm =>
              parts(j) = (parts(j)._1.substring(0, fm.start) + "CAST(" +
                fm.group(1).toLowerCase + fm.group(2), false)
              parts(m) = (") AS " + rm.group(1) + ")" +
                after.substring(rm.end), false)
            }
          }
        }
      }
      m += 1
    }

    val rendered = parts.map {
      case (seg, true) => (seg, true) // literal — untouched
      case (seg, false) =>
        var out = seg
        for ((from, to) <- renames if from != to)
          out = out.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
        // zero-arg constants: consume the parens entirely
        out = out.replaceAll("(?i)\\bnan\\s*\\(\\s*\\)", "double('NaN')")
        out = out.replaceAll("(?i)\\binfinity\\s*\\(\\s*\\)", "double('Infinity')")
        // utf8 codecs: Spark's decode/encode require an explicit charset.
        // Conservative single-argument form (no nested parens/literals/
        // commas — the reference's two-arg from_utf8(x, repl) form passes
        // through untouched rather than mistranslating).
        out = out.replaceAll(
          "(?i)\\bfrom_utf8\\s*\\(([^(),']*)\\)", "decode($1, 'UTF-8')")
        out = out.replaceAll(
          "(?i)\\bto_utf8\\s*\\(([^(),']*)\\)", "encode($1, 'UTF-8')")
        // bitwise scalar fns → Spark's infix operators; operand groups
        // exclude commas so a malformed extra-arg call passes through
        // for Spark to reject instead of silently dropping arguments
        out = out.replaceAll(
          "(?i)\\bbitwise_and\\s*\\(([^(),']+),([^(),']+)\\)", "($1 & $2)")
        out = out.replaceAll(
          "(?i)\\bbitwise_or\\s*\\(([^(),']+),([^(),']+)\\)", "($1 | $2)")
        out = out.replaceAll(
          "(?i)\\bbitwise_xor\\s*\\(([^(),']+),([^(),']+)\\)", "($1 ^ $2)")
        out = out.replaceAll(
          "(?i)\\bbitwise_not\\s*\\(([^(),']+)\\)", "~($1)")
        for ((from, to) <- typeRenames if from != to) {
          out = out.replaceAll(s"(?i)\\bAS\\s+$from\\b", s"AS $to")
          out = out.replaceAll(s"(?i)\\b$from\\s*'", s"$to '") // typed literals
        }
        // TRY(expr) → try_(...) has no direct generic form; map the
        // common arithmetic case TRY(a / b) → try_divide(a, b). The
        // denominator may be a single parenthesized group.
        out = out.replaceAll(
          "(?i)\\bTRY\\s*\\(\\s*([^()/,]+)/\\s*(\\([^()]*\\)|[^(),]+)\\s*\\)",
          "try_divide($1,$2)")
        // Quantified comparison predicates (reference grammar
        // `SqlBase.g4` comparisonQuantifier) — Spark has no ANY/ALL
        // subquery syntax. Only the two forms the SQL standard DEFINES
        // as IN / NOT IN rewrite (identical null/empty semantics by
        // definition, SQL:2016 §8.8): `= ANY (…)` / `= SOME (…)` →
        // `IN (…)`, `<> ALL (…)` → `NOT IN (…)`. Ordering quantifiers
        // (> ALL etc.) have no null-safe textual rewrite and pass
        // through for Spark to reject loudly — including the compound
        // operators >= <= !=, whose trailing '=' the lookbehind keeps
        // this rewrite away from (`>= ANY (` must NOT become `>IN (`).
        out = out.replaceAll("(?i)(?<![<>!])=\\s*(?:ANY|SOME)\\s*\\(", "IN (")
        out = out.replaceAll("(?i)(?:<>|!=)\\s*ALL\\s*\\(", "NOT IN (")
        (out, false)
    }
    constructorPass(rendered.toSeq)
  }

  /** Collection-constructor sugar (grammar `SqlBase.g4` primaryExpression
    * ARRAY/ROW/MAP rules): `ARRAY[e1, …]` → `array(e1, …)`,
    * `ROW(e1, …)` → `struct(e1, …)` (Spark compares structs
    * lexicographically regardless of field names, matching row
    * comparison semantics), and the two-array-literal map constructor
    * `MAP(ARRAY[…], ARRAY[…])` → `map_from_arrays(array(…), array(…))`.
    *
    * ARRAY brackets nest and may span string-literal segments
    * (`ARRAY['a', 'b']`), so the pass collapses the segment list into
    * one string with literals swapped for bracket-free sentinels, runs
    * a bracket-matching scan (a stack distinguishes ARRAY-literal `[`
    * from subscript `[`, which is left alone — both engines index
    * arrays 1-based… Spark does NOT, so subscripts deliberately pass
    * through for Spark to evaluate 0-based and the user to write
    * element_at, which IS 1-based in both), then re-expands the
    * sentinels. `CAST(x AS ROW(…))` is NOT supported: the rename
    * produces `AS struct(` which Spark rejects loudly (safe-by-failure
    * posture, same as the AT TIME ZONE limitation above). */
  private def constructorPass(segs: Seq[(String, Boolean)]): String = {
    val lits = segs.collect { case (s, true) => s }
    var li = -1
    val canon = segs.map {
      case (s, true) => li += 1; "\u0001" + li + "\u0002"
      case (s, false) => s
    }.mkString

    // map constructor first, so its ARRAY args are still spelled ARRAY
    var out = canon.replaceAll("(?i)\\bMAP\\s*\\(\\s*(?=ARRAY\\s*\\[)",
      "map_from_arrays(")
    out = out.replaceAll("(?i)\\bROW\\s*\\(", "struct(")

    val sb = new StringBuilder
    val stack = scala.collection.mutable.Stack[Boolean]()
    val arrayRe = "(?i)\\AARRAY\\s*\\[".r
    var i = 0
    while (i < out.length) {
      val c = out.charAt(i)
      val wordStart = i == 0 || !Character.isLetterOrDigit(out.charAt(i - 1)) &&
        out.charAt(i - 1) != '_'
      val m = if (wordStart && (c == 'A' || c == 'a'))
        arrayRe.findFirstMatchIn(out.substring(i)) else None
      m match {
        case Some(mm) =>
          sb ++= "array("; stack.push(true); i += mm.end
        case None =>
          if (c == '[') { stack.push(false); sb += c }
          else if (c == ']' && stack.nonEmpty) {
            sb ++= (if (stack.pop()) ")" else "]")
          } else sb += c
          i += 1
      }
    }

    val litRe = "\u0001(\\d+)\u0002".r
    litRe.replaceAllIn(sb.toString,
      m => java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))
  }
}
