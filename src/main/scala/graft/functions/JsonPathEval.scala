package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._

/** SQL/JSON 2016 path language — parser + evaluator (reference grammar
  * `core/trino-parser/src/main/antlr4/io/trino/jsonpath/JsonPath.g4`,
  * evaluator `core/trino-main/src/main/java/io/trino/json/
  * PathEvaluationVisitor.java` / `PathPredicateEvaluationVisitor.java`;
  * semantics pinned by replaying `TestJsonPathEvaluator` vectors in
  * JsonPathSpec).
  *
  * Covered: lax/strict modes, member + wildcard-member accessors,
  * array subscripts (multi, ranges, `last`), wildcard-array, filters
  * `?(...)` with the full predicate grammar (comparisons, `&&`/`||`/
  * `!`, `exists`, `is unknown`, `starts with`, `like_regex`), binary/
  * unary arithmetic, named variables `$var` (bound through the
  * PASSING clause surface in `sqlcompat/SqlJsonClauses`), and the
  * item methods type()/size()/double()/ceiling()/floor()/abs()/
  * keyvalue()/datetime([template]).
  *
  * datetime() is a CAPABILITY ADD past the reference: its parser
  * accepts the method (`JsonPath.g4:51`) but its evaluator raises
  * ("date method is not yet supported",
  * `PathEvaluationVisitor.java:646`). Here it parses TEXT items per
  * SQL:2016 §9.40 — ISO date / time / timestamp [with offset] by
  * default, or an explicit template (YYYY MM DD HH24 MI SS FFn
  * TZH:TZM) — into typed datetime items: type() reports the datetime
  * kind, comparisons are chronological within a kind and UNKNOWN
  * across categories, and the value serializes as its canonical ISO
  * string.
  *
  * Anything outside the grammar RAISES [[UnsupportedPathError]] at
  * parse time (loud, never a silent NULL).
  *
  * Mode rules exercised by the reference vectors:
  *  - lax auto-unwraps arrays (one level) before member access,
  *    filters, numeric item methods, keyvalue, and arithmetic operands;
  *    NOT before size()/type().
  *  - lax suppresses structural errors (missing member, subscript out
  *    of bounds → empty sequence; non-array under `[...]` → singleton
  *    wrap); strict raises them.
  *  - type errors (e.g. abs() of a string) raise in BOTH modes.
  *
  * Comparison semantics (PathPredicateEvaluationVisitor contract):
  * NULL equals only NULL and orders below nothing (orderings involving
  * NULL are false, not unknown); non-scalars compare only with NULL;
  * scalar pairs of different categories → unknown; errors anywhere in
  * a predicate → unknown; filters drop unknown.
  */
object JsonPathEval {

  /** Evaluation failure — mapped to the caller's ON ERROR behavior. */
  final class PathEvalError(msg: String)
    extends RuntimeException(s"path evaluation failed: $msg")

  /** Unsupported path construct — deliberately NOT a PathEvalError so
    * it escapes to the user instead of becoming a silent NULL. */
  final class UnsupportedPathError(msg: String)
    extends IllegalArgumentException(s"unsupported JSON path: $msg")

  // ---------------------------------------------------------- AST
  private[functions] sealed trait PE
  private case object Ctx extends PE
  private case object Cur extends PE
  private case object LastVar extends PE
  private final case class NamedVar(name: String) extends PE
  private final case class Lit(n: JsonNode) extends PE
  private final case class Member(b: PE, name: String) extends PE
  private final case class WildMember(b: PE) extends PE
  private final case class ArrAcc(b: PE, subs: Seq[(PE, Option[PE])]) extends PE
  private final case class WildArr(b: PE) extends PE
  private final case class FilterE(b: PE, p: Pred) extends PE
  private final case class Method(b: PE, name: String) extends PE
  private final case class DatetimeM(b: PE, template: Option[String]) extends PE
  private final case class Arith(op: Char, l: PE, r: PE) extends PE
  private final case class Unary(negate: Boolean, e: PE) extends PE

  private[functions] sealed trait Pred
  private final case class Cmp(op: String, l: PE, r: PE) extends Pred
  private final case class AndP(l: Pred, r: Pred) extends Pred
  private final case class OrP(l: Pred, r: Pred) extends Pred
  private final case class NotP(p: Pred) extends Pred
  private final case class ExistsP(e: PE) extends Pred
  private final case class IsUnknownP(p: Pred) extends Pred
  private final case class StartsWithP(e: PE, prefix: PE) extends Pred
  private final case class LikeRegexP(e: PE, re: java.util.regex.Pattern) extends Pred

  final case class Parsed private[functions] (
      lax: Boolean, private[functions] val root: PE)

  // parse cache: paths are per-ROW constants in practice; bounded so a
  // pathological dynamic-path workload cannot grow without limit
  private val cache = new ConcurrentHashMap[String, Parsed]()

  def parse(path: String): Parsed = {
    val cached = cache.get(path)
    if (cached != null) return cached
    val p = new PathParser(path).parse()
    if (cache.size > 10000) cache.clear()
    cache.put(path, p)
    p
  }

  // ---------------------------------------------------- parser
  private final class PathParser(src: String) {
    private var pos = 0

    def parse(): Parsed = {
      skipWs()
      // mode word; absent → lax (a superset of the reference, whose
      // grammar requires it — existing callers pass bare '$.x' paths)
      val lax =
        if (eatWord("lax")) true
        else if (eatWord("strict")) false
        else true
      val root = pathExpr()
      skipWs()
      if (pos < src.length) fail(s"trailing input at $pos")
      Parsed(lax, root)
    }

    private def fail(msg: String): Nothing =
      throw new UnsupportedPathError(s"$msg in '$src'")

    private def skipWs(): Unit =
      while (pos < src.length && src.charAt(pos).isWhitespace) pos += 1

    private def peek(): Char = if (pos < src.length) src.charAt(pos) else '\u0000'

    private def eat(c: Char): Boolean = {
      skipWs()
      if (peek() == c) { pos += 1; true } else false
    }

    private def expect(c: Char): Unit =
      if (!eat(c)) fail(s"expected '$c' at $pos")

    private def eatStr(s: String): Boolean = {
      skipWs()
      if (src.regionMatches(pos, s, 0, s.length)) { pos += s.length; true }
      else false
    }

    private def eatWord(w: String): Boolean = {
      skipWs()
      if (src.regionMatches(true, pos, w, 0, w.length) &&
          (pos + w.length >= src.length ||
            !isIdentChar(src.charAt(pos + w.length)))) {
        pos += w.length; true
      } else false
    }

    private def isIdentChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_'

    private def ident(): String = {
      skipWs()
      val start = pos
      if (pos < src.length && (src.charAt(pos).isLetter || src.charAt(pos) == '_')) {
        pos += 1
        while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
        src.substring(start, pos)
      } else fail(s"expected identifier at $pos")
    }

    private def stringLit(): String = {
      skipWs()
      if (peek() != '"') fail(s"expected string literal at $pos")
      pos += 1
      val sb = new StringBuilder
      while (pos < src.length) {
        val c = src.charAt(pos)
        if (c == '"') {
          if (pos + 1 < src.length && src.charAt(pos + 1) == '"') {
            sb.append('"'); pos += 2 // grammar's "" escape
          } else { pos += 1; return sb.toString }
        } else if (c == '\\' && pos + 1 < src.length) {
          // accept common backslash escapes too (JSON-style paths)
          val n = src.charAt(pos + 1)
          sb.append(n match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
          pos += 2
        } else { sb.append(c); pos += 1 }
      }
      fail("unterminated string literal")
    }

    // pathExpression: additive < multiplicative < unary < accessor
    def pathExpr(): PE = {
      var l = mulExpr()
      var continue = true
      while (continue) {
        skipWs()
        if (eat('+')) l = Arith('+', l, mulExpr())
        else if (peekMinusBinary()) { pos += 1; l = Arith('-', l, mulExpr()) }
        else continue = false
      }
      l
    }

    // '-' is binary here (unary handled in unaryExpr); no ambiguity
    // because unaryExpr consumed any leading sign already
    private def peekMinusBinary(): Boolean = { skipWs(); peek() == '-' }

    private def mulExpr(): PE = {
      var l = unaryExpr()
      var continue = true
      while (continue) {
        skipWs()
        if (eat('*')) l = Arith('*', l, unaryExpr())
        else if (eat('/')) l = Arith('/', l, unaryExpr())
        else if (eat('%')) l = Arith('%', l, unaryExpr())
        else continue = false
      }
      l
    }

    private def unaryExpr(): PE = {
      skipWs()
      if (eat('+')) Unary(negate = false, unaryExpr())
      else if (eat('-')) Unary(negate = true, unaryExpr())
      else accessorExpr()
    }

    private val methods =
      Set("type", "size", "double", "ceiling", "floor", "abs", "keyvalue")

    private def accessorExpr(): PE = {
      var b = primary()
      var continue = true
      while (continue) {
        skipWs()
        if (eat('.')) {
          skipWs()
          if (eat('*')) b = WildMember(b)
          else if (peek() == '"') b = Member(b, stringLit())
          else {
            val name = ident()
            skipWs()
            if (peek() == '(') {
              if (name.equalsIgnoreCase("datetime")) {
                expect('(')
                skipWs()
                val tmpl = if (peek() == '"') Some(stringLit()) else None
                skipWs()
                expect(')')
                b = DatetimeM(b, tmpl)
              } else {
                if (!methods.contains(name.toLowerCase))
                  fail(s"unknown item method '$name'")
                expect('('); expect(')')
                b = Method(b, name.toLowerCase)
              }
            } else b = Member(b, name)
          }
        } else if (eat('[')) {
          skipWs()
          if (eat('*')) { expect(']'); b = WildArr(b) }
          else {
            val subs = scala.collection.mutable.ArrayBuffer[(PE, Option[PE])]()
            var more = true
            while (more) {
              val from = pathExpr()
              val to = if (eatWord("to")) Some(pathExpr()) else None
              subs += from -> to
              more = eat(',')
            }
            expect(']')
            b = ArrAcc(b, subs.toSeq)
          }
        } else if (eat('?')) {
          expect('(')
          val p = predicate()
          expect(')')
          b = FilterE(b, p)
        } else continue = false
      }
      b
    }

    private def primary(): PE = {
      skipWs()
      if (eat('(')) { val e = pathExpr(); expect(')'); e }
      else if (peek() == '$') {
        pos += 1
        if (pos < src.length && (src.charAt(pos).isLetter || src.charAt(pos) == '_'))
          NamedVar(ident())
        else Ctx
      }
      else if (eat('@')) Cur
      else if (eatWord("last")) LastVar
      else if (eatWord("null")) Lit(NullNode.instance)
      else if (eatWord("true")) Lit(BooleanNode.TRUE)
      else if (eatWord("false")) Lit(BooleanNode.FALSE)
      else if (peek() == '"') Lit(TextNode.valueOf(stringLit()))
      else numberLit()

    }

    private val numRe =
      "^(?:\\d+(?:\\.\\d*)?|\\.\\d+)(?:[eE][+-]?\\d+)?".r

    private def numberLit(): PE = {
      skipWs()
      numRe.findFirstIn(src.substring(pos)) match {
        case Some(s) =>
          pos += s.length
          Lit(DecimalNode.valueOf(new JBigDecimal(s)))
        case None => fail(s"expected expression at $pos")
      }
    }

    // predicate: || < && < primary
    private def predicate(): Pred = {
      var l = conj()
      while (eatStr("||")) l = OrP(l, conj())
      l
    }

    private def conj(): Pred = {
      var l = predPrimary()
      while (eatStr("&&")) l = AndP(l, predPrimary())
      l
    }

    private def predPrimary(): Pred = {
      skipWs()
      if (eat('!')) {
        // delimitedPredicate: exists(...) or ( predicate )
        skipWs()
        if (eatWord("exists")) { expect('('); val e = pathExpr(); expect(')'); NotP(ExistsP(e)) }
        else { expect('('); val p = predicate(); expect(')'); NotP(p) }
      } else if (eatWord("exists")) {
        expect('('); val e = pathExpr(); expect(')'); ExistsP(e)
      } else if (peek() == '(') {
        // parenthesized predicate [IS UNKNOWN] — or a parenthesized
        // PATH operand of a comparison; disambiguate by backtracking
        val save = pos
        try {
          expect('(')
          val p = predicate()
          expect(')')
          if (eatWord("is")) {
            if (!eatWord("unknown")) fail("expected UNKNOWN after IS")
            IsUnknownP(p)
          } else p
        } catch {
          case _: UnsupportedPathError =>
            pos = save
            comparison()
        }
      } else comparison()
    }

    private def comparison(): Pred = {
      val l = pathExpr()
      skipWs()
      if (eatWord("starts")) {
        if (!eatWord("with")) fail("expected WITH after STARTS")
        skipWs()
        if (peek() == '$') {
          pos += 1
          if (pos < src.length && (src.charAt(pos).isLetter || src.charAt(pos) == '_'))
            StartsWithP(l, NamedVar(ident()))
          else fail("STARTS WITH prefix must be a string literal or named variable")
        } else StartsWithP(l, Lit(TextNode.valueOf(stringLit())))
      } else if (eatWord("like_regex")) {
        val pattern = stringLit()
        val flags = if (eatWord("flag")) stringLit() else ""
        var f = 0
        flags.foreach {
          case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE
          case 's' => f |= java.util.regex.Pattern.DOTALL
          case 'm' => f |= java.util.regex.Pattern.MULTILINE
          case 'x' => f |= java.util.regex.Pattern.COMMENTS
          case other => fail(s"unsupported like_regex flag '$other'")
        }
        LikeRegexP(l, java.util.regex.Pattern.compile(pattern, f))
      } else {
        val op =
          if (eatStr("==")) "=="
          else if (eatStr("<>")) "!="
          else if (eatStr("!=")) "!="
          else if (eatStr("<=")) "<="
          else if (eatStr(">=")) ">="
          else if (eat('<')) "<"
          else if (eat('>')) ">"
          else fail(s"expected comparison operator at $pos")
        Cmp(op, l, pathExpr())
      }
    }
  }

  // ------------------------------------------------- evaluation
  // vars == null marks the no-PASSING-surface call forms: an unbound
  // named variable is then a LOUD UnsupportedPathError (the reference
  // rejects it at analysis time), not an ON ERROR case
  private final case class Ctx0(doc: JsonNode, cur: Option[JsonNode], last: Option[Int],
      vars: Map[String, Option[JsonNode]] = null)

  def evaluate(doc: JsonNode, p: Parsed): Vector[JsonNode] =
    eval(p.root, Ctx0(doc, None, None), p.lax)

  /** PASSING-clause form: `vars` binds named variables — `Some(node)`
    * is a bound JSON item (a SQL null passes as JSON null), `None` is
    * the EMPTY SEQUENCE (a NULL FORMAT JSON parameter). Referencing an
    * unbound name is an evaluation error (ON ERROR behavior). */
  def evaluate(doc: JsonNode, p: Parsed,
      vars: Map[String, Option[JsonNode]]): Vector[JsonNode] =
    eval(p.root, Ctx0(doc, None, None, vars), p.lax)

  private def err(msg: String): Nothing = throw new PathEvalError(msg)

  private def unwrap(items: Vector[JsonNode], lax: Boolean): Vector[JsonNode] =
    if (!lax) items
    else items.flatMap {
      case a: ArrayNode => (0 until a.size).map(a.get)
      case other => Vector(other)
    }

  private def isNumber(n: JsonNode): Boolean = n.isNumber || n.isInstanceOf[DecimalNode]

  private def dec(n: JsonNode): JBigDecimal = n.decimalValue()

  private def eval(pe: PE, c: Ctx0, lax: Boolean): Vector[JsonNode] = pe match {
    case Ctx => Vector(c.doc)
    case Cur => Vector(c.cur.getOrElse(
      err("accessing current filter item with no enclosing filter")))
    case LastVar => Vector(IntNode.valueOf(c.last.getOrElse(
      err("accessing the last array index with no enclosing array"))))
    case NamedVar(name) =>
      if (c.vars == null)
        throw new UnsupportedPathError(
          s"named variable $$$name needs a PASSING clause")
      else c.vars.get(name) match {
        case Some(Some(n)) => Vector(n)
        case Some(None)    => Vector.empty // NULL FORMAT JSON: empty sequence
        case None          =>
          // an unbound name is an ANALYSIS error in the reference
          // (TestJsonExistsFunction testPassingClause) — never
          // suppressed by ON ERROR, so not a PathEvalError
          throw new UnsupportedPathError(
            s"no value passed for parameter $name. Try quoting " +
              s""""$name" in the PASSING clause to match case""")
      }
    case Lit(n) => Vector(n)

    case Member(b, name) =>
      unwrap(eval(b, c, lax), lax).flatMap {
        case o: ObjectNode =>
          if (o.has(name)) Vector(o.get(name))
          else if (lax) Vector.empty
          else err(s"structural error: missing member '$name' in JSON object")
        case other =>
          if (lax) Vector.empty
          else err(s"invalid item type. Expected: OBJECT, actual: ${typeName(other).toUpperCase}")
      }

    case WildMember(b) =>
      unwrap(eval(b, c, lax), lax).flatMap {
        case o: ObjectNode =>
          val it = o.fields()
          val buf = Vector.newBuilder[JsonNode]
          while (it.hasNext) buf += it.next().getValue
          buf.result()
        case other =>
          if (lax) Vector.empty
          else err(s"invalid item type. Expected: OBJECT, actual: ${typeName(other).toUpperCase}")
      }

    case ArrAcc(b, subs) =>
      eval(b, c, lax).flatMap { item =>
        val arr: ArrayNode = item match {
          case a: ArrayNode => a
          case other =>
            if (lax) { val a = JsonNodeFactory.instance.arrayNode(); a.add(other); a }
            else err(s"invalid item type. Expected: ARRAY, actual: ${typeName(other).toUpperCase}")
        }
        val n = arr.size
        val inner = c.copy(last = Some(n - 1))
        subs.flatMap { case (fromE, toE) =>
          val from0 = singletonInt(eval(fromE, inner, lax), "array subscript")
          val to0 = toE.map(e => singletonInt(eval(e, inner, lax), "array subscript"))
            .getOrElse(from0)
          if (!lax) {
            if (from0 > to0 || from0 < 0 || to0 >= n)
              err(s"structural error: invalid array subscript: [$from0, $to0] for array of size $n")
            (from0 to to0).map(arr.get)
          } else {
            val lo = math.max(from0, 0)
            val hi = math.min(to0, n - 1)
            if (from0 > to0 || lo > hi) Vector.empty
            else (lo to hi).map(arr.get)
          }
        }
      }

    case WildArr(b) =>
      eval(b, c, lax).flatMap {
        case a: ArrayNode => (0 until a.size).map(a.get)
        case other =>
          if (lax) Vector(other) // lax wraps then unwraps: identity
          else err(s"invalid item type. Expected: ARRAY, actual: ${typeName(other).toUpperCase}")
      }

    case FilterE(b, p) =>
      unwrap(eval(b, c, lax), lax).filter { item =>
        evalPred(p, c.copy(cur = Some(item)), lax).contains(true)
      }

    case DatetimeM(b, template) =>
      unwrap(eval(b, c, lax), lax).map {
        case t if t.isTextual => parseDatetimeItem(t.asText(), template)
        case other =>
          err(s"invalid item type. Expected: TEXT, actual: ${typeName(other).toUpperCase}")
      }

    case Method(b, name) =>
      val base = eval(b, c, lax)
      name match {
        case "size" => base.map {
          case a: ArrayNode => IntNode.valueOf(a.size)
          case other =>
            if (lax) IntNode.valueOf(1)
            else err(s"invalid item type. Expected: ARRAY, actual: ${typeName(other).toUpperCase}")
        }
        case "type" => base.map(n => TextNode.valueOf(typeName(n)))
        case "keyvalue" =>
          unwrap(base, lax).zipWithIndex.flatMap {
            case (o: ObjectNode, id) =>
              val it = o.fields()
              val buf = Vector.newBuilder[JsonNode]
              while (it.hasNext) {
                val e = it.next()
                val entry = JsonNodeFactory.instance.objectNode()
                entry.set[JsonNode]("name", TextNode.valueOf(e.getKey))
                entry.set[JsonNode]("value", e.getValue)
                entry.set[JsonNode]("id", IntNode.valueOf(id))
                buf += entry
              }
              buf.result()
            case (other, _) =>
              err(s"invalid item type. Expected: OBJECT, actual: ${typeName(other).toUpperCase}")
          }
        case numeric => // double / ceiling / floor / abs
          unwrap(base, lax).map { item =>
            numeric match {
              case "double" =>
                if (isNumber(item)) DoubleNode.valueOf(item.doubleValue())
                else if (item.isTextual) {
                  val d = try item.asText().toDouble catch {
                    case _: NumberFormatException =>
                      err(s"invalid text for double(): '${item.asText()}'")
                  }
                  DoubleNode.valueOf(d)
                } else err(s"invalid item type. Expected: NUMBER, actual: ${typeName(item).toUpperCase}")
              case m =>
                if (!isNumber(item))
                  err(s"invalid item type. Expected: NUMBER, actual: ${typeName(item).toUpperCase}")
                else m match {
                  case "ceiling" =>
                    DecimalNode.valueOf(dec(item).setScale(0, RoundingMode.CEILING))
                  case "floor" =>
                    DecimalNode.valueOf(dec(item).setScale(0, RoundingMode.FLOOR))
                  case "abs" => DecimalNode.valueOf(dec(item).abs())
                }
            }
          }
      }

    case Arith(op, l, r) =>
      val ls = unwrap(eval(l, c, lax), lax)
      val rs = unwrap(eval(r, c, lax), lax)
      if (ls.length != 1 || rs.length != 1)
        err("arithmetic binary expression requires singleton operands")
      val (a, b2) = (ls.head, rs.head)
      if (!isNumber(a) || !isNumber(b2))
        err(s"invalid operand types to ${op} operator (${typeName(a)}, ${typeName(b2)})")
      val (x, y) = (dec(a), dec(b2))
      val res = op match {
        case '+' => x.add(y)
        case '-' => x.subtract(y)
        case '*' => x.multiply(y)
        case '/' =>
          if (y.signum() == 0) err("division by zero")
          try x.divide(y)
          catch { case _: ArithmeticException => x.divide(y, MathContext.DECIMAL64) }
        case '%' =>
          if (y.signum() == 0) err("division by zero")
          x.remainder(y)
      }
      Vector(DecimalNode.valueOf(res))

    case Unary(neg, e) =>
      unwrap(eval(e, c, lax), lax).map { item =>
        if (!isNumber(item))
          err(s"invalid item type. Expected: NUMBER, actual: ${typeName(item).toUpperCase}")
        if (neg) DecimalNode.valueOf(dec(item).negate()) else item
      }
  }

  /** A typed datetime item in the evaluator's JsonNode value domain:
    * serializes as its canonical ISO text, but type() reports the
    * datetime kind and comparisons are chronological (sortKey) within
    * a kind — UNKNOWN across categories, per SQL:2016. */
  private[functions] final class DateTimeNode(
      text: String, val kind: String, val sortKey: Long) extends TextNode(text)

  /** SQL:2016 §9.40 datetime(): parse `s` with the optional template;
    * without one, try ISO date / time / timestamp / timestamp+offset
    * in specificity order. */
  private def parseDatetimeItem(s0: String, template: Option[String]): DateTimeNode = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val s = s0.trim
    def date(d: LocalDate) =
      new DateTimeNode(d.toString, "date", d.toEpochDay)
    def time(t: LocalTime) =
      new DateTimeNode(t.toString, "time without time zone", t.toNanoOfDay)
    def ts(t: LocalDateTime) =
      new DateTimeNode(t.toString, "timestamp without time zone",
        t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
    def tstz(t: OffsetDateTime) =
      new DateTimeNode(t.toString, "timestamp with time zone",
        t.toEpochSecond * 1000000L + t.getNano / 1000L)
    template match {
      case None =>
        try tstz(OffsetDateTime.parse(s)) catch { case _: Exception =>
        try ts(LocalDateTime.parse(s.replace(' ', 'T'))) catch { case _: Exception =>
        try date(LocalDate.parse(s)) catch { case _: Exception =>
        try time(LocalTime.parse(s)) catch { case _: Exception =>
          err(s"cannot parse '$s0' as a datetime (ISO formats; pass a template for others)")
        }}}}
      case Some(tmpl) =>
        // SQL datetime template → java.time pattern; fields present in
        // the template decide the result kind
        val sb = new StringBuilder
        var i = 0
        var hasDate = false
        var hasTime = false
        var hasZone = false
        def at(kw: String): Boolean =
          tmpl.regionMatches(true, i, kw, 0, kw.length)
        while (i < tmpl.length) {
          if (at("YYYY")) { sb ++= "uuuu"; hasDate = true; i += 4 }
          else if (at("MM")) { sb ++= "MM"; hasDate = true; i += 2 }
          else if (at("DD")) { sb ++= "dd"; hasDate = true; i += 2 }
          else if (at("HH24")) { sb ++= "HH"; hasTime = true; i += 4 }
          else if (at("MI")) { sb ++= "mm"; hasTime = true; i += 2 }
          else if (at("SS")) { sb ++= "ss"; hasTime = true; i += 2 }
          else if (at("FF")) {
            i += 2
            require(i < tmpl.length && tmpl.charAt(i).isDigit,
              s"datetime template FF needs a digit count: $tmpl")
            val n = tmpl.charAt(i) - '0'
            sb ++= "S" * n
            i += 1
          }
          else if (at("TZH:TZM")) { sb ++= "xxx"; hasZone = true; i += 7 }
          else if (at("TZH")) { sb ++= "x"; hasZone = true; i += 3 }
          else if ("-/,.;: T'\"".indexOf(tmpl.charAt(i)) >= 0) {
            val ch = tmpl.charAt(i)
            if (ch == 'T') sb ++= "'T'" else sb += ch
            i += 1
          }
          else err(s"unsupported datetime template element at '${tmpl.substring(i)}'")
        }
        val fmt = DateTimeFormatter.ofPattern(sb.toString)
        try {
          if (hasZone) tstz(OffsetDateTime.parse(s, fmt))
          else if (hasDate && hasTime) ts(LocalDateTime.parse(s, fmt))
          else if (hasDate) date(LocalDate.parse(s, fmt))
          else time(LocalTime.parse(s, fmt))
        } catch {
          case e: DateTimeException =>
            err(s"cannot parse '$s0' with template '$tmpl': ${e.getMessage}")
        }
    }
  }

  private def typeName(n: JsonNode): String = n match {
    case _: NullNode => "null"
    case dt: DateTimeNode => dt.kind
    case _ if n.isBoolean => "boolean"
    case _ if isNumber(n) => "number"
    case _ if n.isTextual => "string"
    case _: ArrayNode => "array"
    case _: ObjectNode => "object"
    case _ => "unknown"
  }

  private def singletonInt(items: Vector[JsonNode], what: String): Int = {
    if (items.length != 1 || !isNumber(items.head))
      err(s"$what must be a singleton numeric value")
    items.head.intValue()
  }

  // ----------------------------------------- predicate evaluation
  /** Three-valued: Some(true/false) or None = unknown. */
  private def evalPred(p: Pred, c: Ctx0, lax: Boolean): Option[Boolean] = p match {
    case AndP(l, r) =>
      val a = evalPred(l, c, lax)
      if (a.contains(false)) Some(false)
      else {
        val b = evalPred(r, c, lax)
        if (b.contains(false)) Some(false)
        else if (a.isEmpty || b.isEmpty) None
        else Some(true)
      }
    case OrP(l, r) =>
      val a = evalPred(l, c, lax)
      if (a.contains(true)) Some(true)
      else {
        val b = evalPred(r, c, lax)
        if (b.contains(true)) Some(true)
        else if (a.isEmpty || b.isEmpty) None
        else Some(false)
      }
    case NotP(inner) => evalPred(inner, c, lax).map(!_)
    case IsUnknownP(inner) => Some(evalPred(inner, c, lax).isEmpty)
    case ExistsP(e) =>
      try Some(eval(e, c, lax).nonEmpty)
      catch { case _: PathEvalError => None }
    case StartsWithP(e, prefix) =>
      try {
        val items = unwrap(eval(e, c, lax), lax)
        val ps = unwrap(eval(prefix, c, lax), lax)
        if (ps.length != 1 || !ps.head.isTextual) None
        else if (items.exists(i => !i.isTextual)) None
        else Some(items.exists(_.asText().startsWith(ps.head.asText())))
      } catch { case _: PathEvalError => None }
    case LikeRegexP(e, re) =>
      try {
        val items = unwrap(eval(e, c, lax), lax)
        if (items.exists(i => !i.isTextual)) None
        else Some(items.exists(i => re.matcher(i.asText()).find()))
      } catch { case _: PathEvalError => None }
    case Cmp(op, l, r) =>
      val (ls, rs) =
        try (unwrap(eval(l, c, lax), lax), unwrap(eval(r, c, lax), lax))
        catch { case _: PathEvalError => return None }
      comparePairs(op, ls, rs, lax)
  }

  /** Mirrors PathPredicateEvaluationVisitor.visitIrComparisonPredicate:
    * category pre-check, null fast paths, then ordered pair scan with
    * exists-semantics (lax short-circuits on the first true). */
  private def comparePairs(op: String, ls: Vector[JsonNode],
      rs: Vector[JsonNode], lax: Boolean): Option[Boolean] = {
    def isNull(n: JsonNode) = n.isNull
    def isScalar(n: JsonNode) = !n.isContainerNode && !n.isNull
    val lNonScalar = ls.exists(_.isContainerNode)
    val rNonScalar = rs.exists(_.isContainerNode)
    val lScalar = ls.exists(isScalar)
    val rScalar = rs.exists(isScalar)
    // any non-scalar paired against a scalar or non-scalar → error
    if ((lNonScalar && rNonScalar) || (lNonScalar && rScalar) ||
        (lScalar && rNonScalar)) return None
    var found = false
    val lNull = ls.exists(isNull)
    val rNull = rs.exists(isNull)
    if (op == "==" && lNull && rNull) found = true
    if (op == "!=" &&
        ((lNull && (rScalar || rNonScalar)) || (rNull && (lScalar || lNonScalar))))
      found = true
    if (found && lax) return Some(true)
    if (!lScalar || !rScalar) return Some(found)
    val lSc = ls.filter(isScalar)
    val rSc = rs.filter(isScalar)
    for (a <- lSc; b <- rSc) {
      compareScalars(op, a, b) match {
        case None => return None
        case Some(true) =>
          found = true
          if (lax) return Some(true)
        case Some(false) =>
      }
    }
    Some(found)
  }

  /** Scalar pair comparison: numbers with numbers, strings with
    * strings (codepoint order), booleans with booleans; anything
    * cross-category is an error (None). */
  private def compareScalars(op: String, a: JsonNode, b: JsonNode): Option[Boolean] = {
    val cmp: Option[Int] = (a, b) match {
      // datetime items: chronological within a kind, UNKNOWN across
      // categories (incl. datetime vs plain string) — SQL:2016 §9.40
      case (x: DateTimeNode, y: DateTimeNode) if x.kind == y.kind =>
        Some(java.lang.Long.compare(x.sortKey, y.sortKey))
      case (_: DateTimeNode, _) | (_, _: DateTimeNode) => None
      case _ =>
        if (isNumber(a) && isNumber(b)) Some(dec(a).compareTo(dec(b)))
        else if (a.isTextual && b.isTextual) Some(a.asText().compareTo(b.asText()))
        else if (a.isBoolean && b.isBoolean)
          Some(java.lang.Boolean.compare(a.booleanValue(), b.booleanValue()))
        else None
    }
    cmp.map { x =>
      op match {
        case "==" => x == 0
        case "!=" => x != 0
        case "<" => x < 0
        case "<=" => x <= 0
        case ">" => x > 0
        case ">=" => x >= 0
      }
    }
  }
}
