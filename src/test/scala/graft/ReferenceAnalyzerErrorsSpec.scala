package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sqlcompat.Dialect

/** NEGATIVE vectors from the reference's analyzer error corpus
  * (`core/trino-main/src/test/java/io/trino/sql/analyzer/
  * TestAnalyzer.java`, 871 assertFails vectors): a reference user's
  * second interaction with any engine is a query that doesn't
  * compile, so the dialect layer + Catalyst must REJECT what the
  * reference rejects — loudly, at translate or analysis time — never
  * silently translate garbage into something that runs.
  *
  * Contract asserted here is REJECTION (an exception from
  * `Dialect.translate` or from Spark's analyzer/runtime), not error
  * message parity: the reference's error codes (MISSING_GROUP_BY,
  * NESTED_AGGREGATION, TYPE_MISMATCH, …) map onto Catalyst's
  * equivalent error classes, whose wording differs by design.
  * Vectors the reference rejects but Spark legitimately ACCEPTS via
  * its wider implicit coercion lattice (e.g. `'1' = 1`) are excluded
  * — those are positive-divergence territory, documented in
  * docs/CONFORMANCE.md, not analyzer errors.
  *
  * Fixture shapes mirror TestAnalyzer's `t1(a, b, c, d)` / `t2(a, b)`
  * bigint tables (TestAnalyzer.java:7136 setup).
  */
class ReferenceAnalyzerErrorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var rejected = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-analyzer-errors", 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW t1 AS
      SELECT * FROM VALUES (1L, 2L, 3L, 4L), (5L, 6L, 7L, 8L) AS t1(a, b, c, d)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW t2 AS
      SELECT * FROM VALUES (1L, 2L), (3L, 4L) AS t2(a, b)""")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  /** The vector must throw somewhere on the translate → analyze →
    * execute path; a silent success is the failure mode this battery
    * exists to catch. */
  private def assertRejected(sql: String, hint: String = ""): Unit = {
    try {
      val t = Dialect.translate(sql)
      val rows = spark.sql(t).collect()
      fail(s"expected rejection but got ${rows.length} rows for: $sql " +
        s"(translated: $t) $hint")
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case _: Throwable => rejected += 1 // rejected — the contract
    }
  }

  test("scoping errors: unknown columns, tables, aliases (TestAnalyzer testScoping, testNonExistent*)") {
    assertRejected("SELECT f FROM t1") // TestAnalyzer.java:973 COLUMN_NOT_FOUND
    assertRejected("SELECT * FROM no_such_table_xyz") // :918 TABLE_NOT_FOUND
    assertRejected("SELECT * FROM foo.bar.t") // :912 CATALOG_NOT_FOUND
    assertRejected("SELECT u.a FROM t1") // alias not in scope
    assertRejected("SELECT t9.* FROM t1") // wildcard over unknown alias
    assertRejected("SELECT a FROM t1 x, t1 y") // AMBIGUOUS_NAME (both expose a)
    assertRejected("SELECT t1.f FROM t1") // qualified unknown column
  }

  test("grouping errors: ordinals, non-grouped references, aggregates in GROUP BY (testGroupByCase, testMismatchedColumnAliasCount)") {
    assertRejected("SELECT * FROM t1 GROUP BY 1") // :539 b,c,d not grouped
    assertRejected("SELECT * FROM t1 GROUP BY 10") // :629 ordinal out of range
    assertRejected("SELECT * FROM t1 GROUP BY 0") // :632
    assertRejected( // :640 aggregate inside GROUP BY
      "SELECT x, sum(y) FROM (VALUES (1, 2)) t(x, y) GROUP BY x, sum(y)")
    assertRejected("SELECT a, sum(b) FROM t1") // :945 MISSING_GROUP_BY
    assertRejected("SELECT sum(b) / a FROM t1") // :947
    assertRejected("SELECT sum(b) / a FROM t1 GROUP BY c") // :949
    assertRejected("SELECT a, sum(b) FROM t1 GROUP BY a HAVING c > 5") // :953
    assertRejected("SELECT sum(b) FROM t1 ORDER BY a + 1") // :951
    assertRejected("SELECT 'a', array[b][1] FROM t1 GROUP BY 1") // :943
  }

  test("aggregate misuse: WHERE / JOIN ON / nesting (testAggregateInWhere, testNestedAggregation)") {
    assertRejected("SELECT * FROM t1 WHERE sum(a) > 1") // :782 aggregate in WHERE
    assertRejected("SELECT * FROM t1 GROUP BY sum(a)") // :785
    assertRejected("SELECT * FROM t1 JOIN t2 ON sum(t1.a) = t2.a") // :788
    assertRejected("SELECT sum(count(*)) FROM t1") // :774 NESTED_AGGREGATION
    assertRejected("SELECT lower(DISTINCT a) FROM (VALUES('foo')) AS t1(a)") // :294
    assertRejected("SELECT sum(a) FILTER (WHERE count(*) > 1) FROM t1") // agg in FILTER
  }

  test("window misuse: WHERE / GROUP BY / HAVING / missing OVER (testWindowInWhere, testMissingOver)") {
    assertRejected("SELECT * FROM t1 WHERE rank() OVER () > 1") // :797 window in WHERE
    assertRejected("SELECT * FROM t1 GROUP BY rank() OVER ()") // :800
    assertRejected("SELECT * FROM t1 JOIN t2 ON sum(t1.a) OVER () = t2.a") // :803
    assertRejected("SELECT 1 FROM (VALUES 1) HAVING count(*) OVER () > 1") // :806
    assertRejected("SELECT row_number() FROM t1") // MISSING_OVER
    assertRejected( // :955 window partition references non-grouped column
      "SELECT count(*) OVER (PARTITION BY a) FROM t1 GROUP BY b")
    assertRejected("SELECT count(*) OVER w FROM t1") // undefined named window
    // Documented divergence (not asserted): the reference raises
    // NESTED_WINDOW for `avg(row_number() OVER ()) OVER ()`; Spark
    // evaluates layered windows as successive Window operators — an
    // extension, and a nondeterministic one for unordered frames.
  }

  test("window frame misuse: inverted and non-constant bounds (testWindowFrames)") {
    assertRejected( // frame start after end
      "SELECT count(*) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED FOLLOWING AND CURRENT ROW) FROM t1")
    assertRejected(
      "SELECT count(*) OVER (ORDER BY a ROWS BETWEEN CURRENT ROW AND UNBOUNDED PRECEDING) FROM t1")
    assertRejected( // RANGE offset frame without ORDER BY key
      "SELECT count(*) OVER (RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t1")
    assertRejected( // negative literal frame offset
      "SELECT count(*) OVER (ORDER BY a ROWS -1 PRECEDING) FROM t1")
  }

  test("grouping() misuse (testGrouping*)") {
    assertRejected("SELECT grouping(a) FROM t1") // :870 no GROUP BY
    assertRejected("SELECT * FROM t1 ORDER BY grouping(a)") // :873
    assertRejected("SELECT grouping(a) FROM t1 GROUP BY b") // :876 a not grouped
    assertRejected( // :860 grouping() in WHERE
      "SELECT a, b, sum(c) FROM t1 WHERE grouping(a, b) > 0 GROUP BY GROUPING SETS ((a), (a, b))")
  }

  test("ORDER BY / DISTINCT / set-op shape errors (testOrderBy*, testUnion*)") {
    assertRejected("SELECT * FROM t1 ORDER BY 10") // :728 ordinal out of range
    assertRejected("SELECT * FROM t1 ORDER BY 0") // :731
    assertRejected("SELECT DISTINCT a FROM t1 ORDER BY b") // ORDER BY must appear in select
    assertRejected("SELECT 1 UNION SELECT 1, 2") // column count mismatch
    assertRejected("SELECT a FROM t1 UNION SELECT a, b FROM t1") // same, named
    assertRejected("SELECT * FROM (VALUES (1, 2), (3)) t(x, y)") // VALUES row arity
    assertRejected("SELECT * FROM (VALUES 1, 2) t(x, y)") // MISSING_COLUMN_ALIASES arity
  }

  test("subquery shape errors (testScalarSubQuery, testMultiColumn)") {
    assertRejected("SELECT (SELECT 1, 2)") // multi-column scalar subquery
    assertRejected("SELECT * FROM t1 WHERE a = (SELECT a, b FROM t2)") // same in predicate
    assertRejected("SELECT (SELECT u.a FROM (VALUES 1) x(a)) FROM t1 u GROUP BY b") // :659
    assertRejected("SELECT EXISTS(SELECT u.a FROM (VALUES 1) x(a)) FROM t1 u GROUP BY b") // :690
  }

  test("type-mismatch predicates and limits (testInValueTypes, testFetchFirst)") {
    assertRejected("SELECT * FROM t1 WHERE a") // non-boolean WHERE (TYPE_MISMATCH)
    assertRejected("SELECT * FROM t1 HAVING a") // non-boolean HAVING
    assertRejected( // bigint BETWEEN date bounds
      "SELECT * FROM t1 WHERE a BETWEEN DATE '2020-01-01' AND DATE '2021-01-01'")
    assertRejected("SELECT * FROM t1 LIMIT -1") // negative limit
    assertRejected("SELECT * FROM t1 OFFSET -1") // negative offset
    assertRejected("SELECT NOT a FROM t1") // NOT over bigint
  }

  test("function arity / unknown function (testFunctionArguments)") {
    assertRejected("SELECT abs(1, 2) FROM t1") // wrong arity
    assertRejected("SELECT lower() FROM t1") // missing argument
    assertRejected("SELECT no_such_function_xyz(a) FROM t1") // FUNCTION_NOT_FOUND
    assertRejected("SELECT substr('a', 1, 2, 3)") // reference substr max arity 3
  }

  test("WITH / recursion shape errors (testWith*, WITH RECURSIVE guard)") {
    assertRejected("WITH x(a, a) AS (SELECT 1, 2) SELECT * FROM x") // duplicate column alias
    assertRejected( // mutual recursion — named error from the dialect guard
      "WITH RECURSIVE a(x) AS (SELECT 1 UNION ALL SELECT x + 1 FROM b WHERE x < 3), " +
        "b(x) AS (SELECT 0 UNION ALL SELECT x FROM a) SELECT * FROM a")
    assertRejected( // non-linear recursion
      "WITH RECURSIVE f(x) AS (SELECT 1 UNION ALL " +
        "SELECT l.x + r.x FROM f l, f r WHERE l.x < 8) SELECT * FROM f")
    assertRejected("WITH x AS (SELECT 1 AS v) SELECT * FROM x(a)") // column aliases on plain CTE ref
  }

  test("named-window errors: duplicates, undefined refs, illegal extension (testWindowSpecification, TestAnalyzer:1196-1459)") {
    assertRejected( // :1196 duplicate window definition
      "SELECT * FROM t1 WINDOW w AS (PARTITION BY a), w AS (PARTITION BY a)")
    assertRejected( // :1199 duplicate with different specs
      "SELECT * FROM t1 WINDOW w AS (PARTITION BY a), w AS (ORDER BY b)")
    assertRejected( // :1425 OVER w with only w1 defined
      "SELECT max(b) OVER w FROM t1 WINDOW w1 AS (PARTITION BY a)")
    assertRejected( // :1246 window definition scoped to the inner query
      "SELECT avg(b) OVER w FROM (SELECT * FROM t1 WINDOW w AS (PARTITION BY a))")
    assertRejected( // :1429 extending a window that has ORDER BY with PARTITION BY
      "SELECT max(c) OVER (w PARTITION BY a) FROM t1 WINDOW w AS (ORDER BY b)")
    assertRejected( // :1433 re-specifying ORDER BY on an ordered window
      "SELECT max(c) OVER (w ORDER BY a) FROM t1 WINDOW w AS (ORDER BY b)")
  }

  test("frame-bound type and value errors (testWindowFrameTypeRows/Range, TestAnalyzer:1619-1720)") {
    assertRejected("SELECT rank() OVER (ROWS 5e-1 PRECEDING) FROM t1") // fractional ROWS offset
    assertRejected("SELECT rank() OVER (ROWS 'foo' PRECEDING) FROM t1") // string ROWS offset
    assertRejected( // :1629 start after end
      "SELECT rank() OVER (ROWS BETWEEN 2 FOLLOWING AND 5 PRECEDING) FROM t1")
    assertRejected( // :1712 RANGE offset over a STRING sort key
      "SELECT count(*) OVER (ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM (VALUES 'a') t(x)")
    assertRejected( // :1716 string-typed RANGE offsets
      "SELECT count(*) OVER (ORDER BY x RANGE BETWEEN 'a' PRECEDING AND 'z' FOLLOWING) FROM (VALUES 1) t(x)")
    assertRejected( // :1708 RANGE offset frame needs exactly one sort key
      "SELECT count(*) OVER (ORDER BY x DESC, x ASC RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM (VALUES 1) t(x)")
    assertRejected( // :1654 RANGE starting UNBOUNDED FOLLOWING
      "SELECT count(*) OVER (ORDER BY x RANGE UNBOUNDED FOLLOWING) FROM (VALUES 1) t(x)")
  }

  test("value-function window constraints (testWindowAttributesForLagLeadFunctions, TestAnalyzer:1601-1612)") {
    assertRejected( // :1601 lag requires window ORDER BY
      "SELECT lag(x, 2) OVER () FROM (VALUES 1, 2, 3) t(x)")
    assertRejected( // :1612 lead outside a window context
      "SELECT coalesce(lead(a), 0) FROM (VALUES (0)) t(a)")
    assertRejected( // aggregate over a window function (TestAnalyzer:1548)
      "SELECT avg(sum(a) OVER ()) FROM t1")
    // Documented divergence (not asserted): `avg(a) OVER (PARTITION
    // BY sum(b) OVER ())` raises NESTED_WINDOW in the reference
    // (:1552); Spark evaluates it as layered Window operators.
  }

  test("output-alias ambiguity and aliasing shape errors (TestAnalyzer:1129-1189)") {
    assertRejected("SELECT * FROM t1 u (x, y)") // :1129 alias column count mismatch
    assertRejected("SELECT * FROM t1 JOIN t2 ON 5") // :1142 non-boolean join criteria
    assertRejected("SELECT * FROM t1 JOIN t2 ON a = a") // :1149 ambiguous in ON
    assertRejected("SELECT a x, b x FROM t1 ORDER BY x") // :1171 ambiguous output alias
    // Documented divergence (not asserted): `HAVING sum(a)` (:1164,
    // non-boolean HAVING) runs on Spark via implicit bigint→boolean
    // coercion in HAVING position (WHERE stays strict — asserted in
    // the type-mismatch battery).
  }

  test("LISTAGG / ordered-aggregate clause misuse (TestListagg analysis rows)") {
    assertRejected( // malformed ON OVERFLOW behavior — dialect raises a named error
      "SELECT listagg(a, ',' ON OVERFLOW EXPLODE) WITHIN GROUP (ORDER BY a) FROM t1")
    assertRejected( // LISTAGG over no arguments
      "SELECT listagg() WITHIN GROUP (ORDER BY a) FROM t1")
  }

  test("row-pattern front-end analysis errors (MatchRecognizeSql named errors)") {
    assertRejected( // DEFINE references an undefined pattern variable
      """SELECT * FROM t1 MATCH_RECOGNIZE (
        |  PARTITION BY a ORDER BY b
        |  MEASURES Z.b AS zb
        |  PATTERN (X Y)
        |  DEFINE X AS b > 0
        |) AS mr""".stripMargin)
    assertRejected( // pattern variable defined twice
      """SELECT * FROM t1 MATCH_RECOGNIZE (
        |  PARTITION BY a ORDER BY b
        |  PATTERN (X)
        |  DEFINE X AS b > 0, X AS b < 0
        |) AS mr""".stripMargin)
  }
}
