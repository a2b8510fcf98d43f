package graft.sqlcompat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{explode, expr}

/** SQL-text surface for the reference dialect's relation-level
  * constructs that are NOT expressible as the function renames of
  * [[Dialect]] (reference grammar `SqlBase.g4:331-333` sampledRelation
  * and the UNNEST relation primary):
  *
  *   - `FROM t CROSS JOIN UNNEST(expr) [WITH ORDINALITY] AS a(c[, o])`
  *     — lowered onto `Ops.unnestWithOrdinality` (a narrow posexplode
  *     generator, 1-based bigint ordinality, no shuffle) or a plain
  *     `explode` when ordinality is not requested;
  *   - `FROM t TABLESAMPLE BERNOULLI(p)` / `SYSTEM(p)` — lowered onto
  *     `DataFrame.sample(p/100)` (row-level Bernoulli; SYSTEM's
  *     block-level sampling has no Spark analog, so both forms sample
  *     per-row — same row-count distribution, different locality).
  *
  * Supported subset (anything else fails loudly, never silently
  * mistranslates): a single FROM table, one UNNEST or TABLESAMPLE
  * clause, an optional trailing WHERE, and a select list of plain
  * expressions. Select-list and WHERE fragments pass through
  * [[Dialect.translate]] so reference function spellings keep working
  * inside them.
  */
object RelationSql {

  /** Parse + lower `sql` (reference dialect). `resolve` maps the FROM
    * table name to its DataFrame. */
  def translate(sql: String, resolve: String => DataFrame): DataFrame = {
    val head = "(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+".r
    val m = head.findFirstMatchIn(sql).getOrElse(fail(
      "expected SELECT <exprs> FROM <table> <UNNEST or TABLESAMPLE clause>"))
    val selectList = MatchRecognizeSql.splitTopLevel(m.group(1), ',')
      .map(_.trim).filter(_.nonEmpty)
    val table = m.group(2)
    var rest = sql.substring(m.end)

    val unnestRe = "(?is)^\\s*CROSS\\s+JOIN\\s+UNNEST\\s*\\(".r
    val sampleRe =
      "(?is)^\\s*TABLESAMPLE\\s+(BERNOULLI|SYSTEM)\\s*\\(\\s*(\\d+(?:\\.\\d+)?)\\s*\\)".r

    val base = resolve(table)
    val rel: DataFrame = unnestRe.findFirstMatchIn(rest) match {
      case Some(um) =>
        val open = um.end - 1
        val close = MatchRecognizeSql.matchParen(rest, open)
        val arrExpr = rest.substring(open + 1, close)
        rest = rest.substring(close + 1)
        val tail = ("(?is)^\\s*(WITH\\s+ORDINALITY\\s+)?" +
          "AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)" +
          "(?:\\s*,\\s*([A-Za-z_][A-Za-z0-9_]*))?\\s*\\)").r
        val tm = tail.findFirstMatchIn(rest).getOrElse(fail(
          "UNNEST requires AS alias(col[, ord]) (with the ord column " +
            "only under WITH ORDINALITY)"))
        rest = rest.substring(tm.end)
        val ordinality = tm.group(1) != null
        val colName = tm.group(3)
        val ordName = Option(tm.group(4))
        val arr = expr(Dialect.translate(arrExpr))
        if (ordinality) {
          val o = ordName.getOrElse(fail(
            "WITH ORDINALITY requires two output columns: AS a(col, ord)"))
          graft.operators.Ops.unnestWithOrdinality(base, arr, o, colName)
        } else {
          if (ordName.isDefined)
            fail("two output columns require WITH ORDINALITY")
          base.withColumn(colName, explode(arr))
        }
      case None =>
        sampleRe.findFirstMatchIn(rest) match {
          case Some(sm) =>
            rest = rest.substring(sm.end)
            val pct = sm.group(2).toDouble
            if (pct < 0 || pct > 100) fail(s"sample percentage out of range: $pct")
            // Fixed seed: reruns of one translated query are stable
            // (the gate treats sampling as rows-only regardless).
            base.sample(withReplacement = false, pct / 100.0, seed = 42)
          case None => fail(
            s"expected CROSS JOIN UNNEST(...) or TABLESAMPLE at: '${rest.take(60)}'")
        }
    }

    val whereRe = "(?is)^\\s*WHERE\\s+(.*)$".r
    val filtered = rest.trim match {
      case "" => rel
      case whereRe(pred) => rel.filter(expr(Dialect.translate(pred)))
      case other => fail(s"unsupported trailing clause: '${other.take(60)}'")
    }
    filtered.select(selectList.map(e => expr(Dialect.translate(e))): _*)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"relation SQL: $msg")
}
