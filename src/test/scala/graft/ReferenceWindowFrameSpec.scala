package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference engine's window-frame conformance corpora, replayed
  * verbatim through `Dialect.translate`:
  *
  *  - `core/trino-main/src/test/java/io/trino/sql/query/
  *    TestWindowFrameGroups.java` (GROUPS frames — this engine's own
  *    RANGE-over-dense_rank rewrite, so these are its edge vectors)
  *  - `TestWindowFrameRange.java` (RANGE offsets: null sort keys,
  *    mixed bounds, intervals over DATE, fractional offsets, dynamic
  *    per-row offsets, invalid-offset errors)
  *  - `TestWindowFrameRows.java` (typed / overflowing ROWS offsets)
  *
  * All expected values are the reference's own literals (VALUES
  * expressions), compared as unordered multisets exactly like the
  * reference's `assertThat(...).matches(...)`.
  */
class ReferenceWindowFrameSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var vectorCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-window-frame-vectors", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"replayed $vectorCount reference window-frame vectors")
    if (spark != null) spark.stop()
  }

  private def runQ(sql: String): DataFrame =
    spark.sql(graft.sqlcompat.Dialect.translate(sql))

  private def canonVal(v: Any): String = v match {
    case null => "ø"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: BigDecimal => d.underlying.stripTrailingZeros.toPlainString
    case f: Float => canonVal(f.toDouble)
    case d: Double if d.isNaN || d.isInfinite => d.toString
    case d: Double =>
      new java.math.BigDecimal(d.toString).stripTrailingZeros.toPlainString
    case n: Number =>
      new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => canonVal(r.get(i))).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(canonVal).mkString("[", ",", "]")
    case other => other.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => canonVal(r.get(i))).mkString("|"))

  private def v(query: String, expected: String): Unit = {
    val got = rows(runQ(query)).sorted
    val want = rows(runQ(expected)).sorted
    vectorCount += 1
    assert(got == want,
      s"\nquery:    $query\ngot:      $got\nexpected: $want")
  }

  private def vEmpty(query: String): Unit = {
    vectorCount += 1
    assert(rows(runQ(query)).isEmpty, s"\nexpected empty result: $query")
  }

  private def vErr(query: String): Unit = {
    vectorCount += 1
    val e = intercept[Throwable] { runQ(query).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains(
      "Window frame offset value must not be negative or null")),
      s"\nwrong error for: $query\ngot: ${e.getMessage}")
  }

  // ================================================ TestWindowFrameGroups

  test("GROUPS constant offsets (TestWindowFrameGroups.java:47)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 1 PRECEDING AND 2 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null, 1, 2, 2], ARRAY[null, null, 1, 2, 2], " +
        "ARRAY[null, null, 1, 2, 2, 3, 3, 3], ARRAY[1, 2, 2, 3, 3, 3], " +
        "ARRAY[1, 2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS CURRENT ROW) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1], ARRAY[2, 2], " +
        "ARRAY[2, 2], ARRAY[3, 3, 3], ARRAY[3, 3, 3], ARRAY[3, 3, 3]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 0 PRECEDING AND 0 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1], ARRAY[2, 2], " +
        "ARRAY[2, 2], ARRAY[3, 3, 3], ARRAY[3, 3, 3], ARRAY[3, 3, 3]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[1, 2, 2], ARRAY[1, 2, 2], ARRAY[2, 2, 3, 3, 3], " +
        "ARRAY[3, 3, 3], ARRAY[3, 3, 3], null, null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES null, null, ARRAY[null, null], ARRAY[null, null, 1], " +
        "ARRAY[null, null, 1], ARRAY[1, 2, 2], ARRAY[1, 2, 2], ARRAY[1, 2, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 2 FOLLOWING AND 1 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES CAST(null AS array(integer)), null, null, null, null, null, null, null")
  }

  test("GROUPS offset types incl. overflowing decimals (TestWindowFrameGroups.java:124)") {
    val expected = "VALUES ARRAY[null, null, 1, 2, 2], ARRAY[null, null, 1, 2, 2], " +
      "ARRAY[null, null, 1, 2, 2, 3, 3, 3], ARRAY[1, 2, 2, 3, 3, 3], " +
      "ARRAY[1, 2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3]"
    for (ty <- Seq("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "DECIMAL"))
      v(s"SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN $ty '1' PRECEDING AND $ty '2' FOLLOWING) " +
        "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)", expected)
    val expectedAll = "VALUES ARRAY[null, null, 1, 2, 2, 3, 3, 3], " +
      "ARRAY[null, null, 1, 2, 2, 3, 3, 3], ARRAY[null, null, 1, 2, 2, 3, 3, 3], " +
      "ARRAY[1, 2, 2, 3, 3, 3], ARRAY[1, 2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], " +
      "ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3]"
    for (big <- Seq("2147483648", "9223372036854775807", "9223372036854775808",
      "999999999999999999999999999999"))
      v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 1 PRECEDING AND " +
        s"DECIMAL '$big' FOLLOWING) FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
        expectedAll)
  }

  test("GROUPS no-value frame bounds (TestWindowFrameGroups.java:196)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 1, 1], " +
        "ARRAY[null, null, 1, 1], ARRAY[null, null, 1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN CURRENT ROW AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1, 1], ARRAY[1, 1], ARRAY[2]")
  }

  test("GROUPS mixed-type frame bounds (TestWindowFrameGroups.java:234)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES null, null, ARRAY[1, 1], ARRAY[1, 1, 2], ARRAY[1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[1, 1, 2, null, null], " +
        "ARRAY[1, 1, 2, null, null], ARRAY[1, 1, 2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2, null, null], " +
        "ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1], ARRAY[1, 1], ARRAY[1, 1, 2], ARRAY[2, null, null], ARRAY[2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2, null, null], ARRAY[1, 1, 2, null, null], " +
        "ARRAY[1, 1, 2, null, null], ARRAY[2, null, null], ARRAY[2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2, null, null], ARRAY[2, null, null], ARRAY[null, null], null, null")
  }

  test("GROUPS empty frame (TestWindowFrameGroups.java:296)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN 90 PRECEDING AND 100 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES CAST(null AS array(integer)), null, null, null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST GROUPS BETWEEN 100 FOLLOWING AND 90 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES CAST(null AS array(integer)), null, null, null, null")
  }

  test("GROUPS non-constant offsets (TestWindowFrameGroups.java:313)") {
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN x PRECEDING AND y FOLLOWING) " +
      "FROM (VALUES ('a', 1, 1), ('b', 2, 0), ('c', 0, 3)) t(a, x, y)",
      "VALUES ARRAY['a', 'b'], ARRAY['a', 'b'], ARRAY['c']")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN x FOLLOWING AND y FOLLOWING) " +
      "FROM (VALUES ('a', 1, 1), ('b', 2, 0), ('c', 3, 3), ('d', 0, 0)) t(a, x, y)",
      "VALUES ARRAY['b'], null, null, ARRAY['d']")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN x PRECEDING AND y PRECEDING) " +
      "FROM (VALUES ('a', 1, 1), ('b', 0, 2), ('c', 2, 1), ('d', 0, 2)) t(a, x, y)",
      "VALUES null, null, ARRAY['a', 'b'], null")
  }

  test("GROUPS empty input / only nulls / same values (TestWindowFrameGroups.java:341)") {
    vEmpty("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (SELECT 1 WHERE false) t(a)")
    vEmpty("SELECT array_agg(a) OVER(ORDER BY a GROUPS UNBOUNDED PRECEDING) " +
      "FROM (SELECT 1 WHERE false) t(a)")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 1 PRECEDING AND 2 FOLLOWING) " +
      "FROM (VALUES CAST(null AS integer), null, null) t(a)",
      "VALUES CAST(ARRAY[null, null, null] AS array(integer)), " +
        "ARRAY[null, null, null], ARRAY[null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES CAST(null AS integer), null, null) t(a)",
      "VALUES CAST(null AS array(integer)), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES CAST(null AS integer), null, null) t(a)",
      "VALUES CAST(null AS array(integer)), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES 'a', 'a', 'a') t(a)",
      "VALUES CAST(null AS array(varchar(1))), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 'a', 'a', 'a') t(a)",
      "VALUES CAST(null AS array(varchar(1))), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 'a', 'a', 'a') t(a)",
      "VALUES ARRAY['a', 'a', 'a'], ARRAY['a', 'a', 'a'], ARRAY['a', 'a', 'a']")
    v("SELECT array_agg(a) OVER(ORDER BY a GROUPS BETWEEN 10 PRECEDING AND 10 FOLLOWING) " +
      "FROM (VALUES 'a', 'a', 'a') t(a)",
      "VALUES ARRAY['a', 'a', 'a'], ARRAY['a', 'a', 'a'], ARRAY['a', 'a', 'a']")
  }

  test("GROUPS invalid offsets raise (TestWindowFrameGroups.java:410)") {
    vErr("SELECT array_agg(a) OVER(ORDER BY a ASC GROUPS x PRECEDING) " +
      "FROM (VALUES (1, 1), (2, -2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a ASC GROUPS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (2, -2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS x PRECEDING) " +
      "FROM (VALUES (1, 1), (2, -2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (2, -2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS x PRECEDING) " +
      "FROM (VALUES (1, 1), (2, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (2, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (null, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC GROUPS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (null, -1)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a GROUPS x PRECEDING) " +
      "FROM (VALUES (1, BIGINT '-1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a GROUPS x PRECEDING) " +
      "FROM (VALUES (1, INTEGER '-1')) t(a, x)")
  }

  test("GROUPS window partitioning (TestWindowFrameGroups.java:457)") {
    v("SELECT a, p, array_agg(a) OVER(PARTITION BY p ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES (1, 'x'), (2, 'x'), (null, 'x'), (null, 'y'), (2, 'y')) t(a, p)",
      "VALUES (null, 'x', ARRAY[null, 1]), (1, 'x', ARRAY[null, 1, 2]), " +
        "(2, 'x', ARRAY[1, 2]), (null, 'y', ARRAY[null, 2]), (2, 'y', ARRAY[null, 2])")
    v("SELECT a, p, array_agg(a) OVER(PARTITION BY p ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 0 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES (1, 'x'), (2, 'x'), (null, 'x'), (null, 'y'), (2, 'y'), (null, null), (null, null), (1, null)) t(a, p)",
      "VALUES (null, null, ARRAY[null, null, 1]), (null, null, ARRAY[null, null, 1]), " +
        "(1, null, ARRAY[1]), (null, 'x', ARRAY[null, 1]), (1, 'x', ARRAY[1, 2]), " +
        "(2, 'x', ARRAY[2]), (null, 'y', ARRAY[null, 2]), (2, 'y', ARRAY[2])")
  }

  test("GROUPS multiple window functions (TestWindowFrameGroups.java:481)") {
    v("SELECT x, array_agg(date) OVER(ORDER BY x GROUPS BETWEEN 1 PRECEDING AND 1 PRECEDING), " +
      "avg(number) OVER(ORDER BY x GROUPS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) " +
      "FROM (VALUES (2, DATE '2222-01-01', 4.4), (1, DATE '1111-01-01', 2.2), (3, DATE '3333-01-01', 6.6)) t(x, date, number)",
      "VALUES (1, null, 4.4), (2, ARRAY[DATE '1111-01-01'], 6.6), (3, ARRAY[DATE '2222-01-01'], null)")
    v("SELECT x, array_agg(a) OVER(ORDER BY x RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), " +
      "array_agg(a) OVER(ORDER BY x GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING), " +
      "array_agg(a) OVER(ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES (1.0, 1), (2.0, 2), (3.0, 3), (4.0, 4), (5.0, 5), (6.0, 6)) t(x, a)",
      "VALUES (1.0, ARRAY[1], ARRAY[2, 3], ARRAY[1]), (2.0, ARRAY[1, 2], ARRAY[3, 4], ARRAY[1, 2]), " +
        "(3.0, ARRAY[1, 2, 3], ARRAY[4, 5], ARRAY[2, 3]), (4.0, ARRAY[2, 3, 4], ARRAY[5, 6], ARRAY[3, 4]), " +
        "(5.0, ARRAY[3, 4, 5], ARRAY[6], ARRAY[4, 5]), (6.0, ARRAY[4, 5, 6], null, ARRAY[5, 6])")
  }

  test("GROUPS offset overflows integer (TestWindowFrameGroups.java:517)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 0 PRECEDING AND 1234567890123456789 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null, 1, 2, 2, 3, 3, 3], ARRAY[null, null, 1, 2, 2, 3, 3, 3], " +
        "ARRAY[1, 2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], ARRAY[2, 2, 3, 3, 3], " +
        "ARRAY[3, 3, 3], ARRAY[3, 3, 3], ARRAY[3, 3, 3]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST GROUPS BETWEEN 1234567890123456789 PRECEDING AND 0 FOLLOWING) " +
      "FROM (VALUES 3, 3, 3, 2, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 1], " +
        "ARRAY[null, null, 1, 2, 2], ARRAY[null, null, 1, 2, 2], " +
        "ARRAY[null, null, 1, 2, 2, 3, 3, 3], ARRAY[null, null, 1, 2, 2, 3, 3, 3], " +
        "ARRAY[null, null, 1, 2, 2, 3, 3, 3]")
  }

  // ================================================= TestWindowFrameRange

  test("RANGE nulls sort key (TestWindowFrameRange.java:44)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[1, 1, 2, 2], ARRAY[1, 1, 2, 2], ARRAY[1, 1, 2, 2, 3], " +
        "ARRAY[1, 1, 2, 2, 3], ARRAY[2, 2, 3]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES ARRAY[1, 1, 2, 2], ARRAY[1, 1, 2, 2], ARRAY[1, 1, 2, 2, 3], " +
        "ARRAY[1, 1, 2, 2, 3], ARRAY[2, 2, 3], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], ARRAY[null, null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[3, 2, 2], ARRAY[3, 2, 2, 1, 1], ARRAY[3, 2, 2, 1, 1], " +
        "ARRAY[2, 2, 1, 1], ARRAY[2, 2, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES ARRAY[3, 2, 2], ARRAY[3, 2, 2, 1, 1], ARRAY[3, 2, 2, 1, 1], " +
        "ARRAY[2, 2, 1, 1], ARRAY[2, 2, 1, 1], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], ARRAY[null, null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2) t(a)",
      "VALUES ARRAY[1, 2, null, null], ARRAY[1, 2, null, null], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2) t(a)",
      "VALUES ARRAY[1, 2], ARRAY[1, 2], ARRAY[1, 2, null, null], ARRAY[1, 2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 1, 2], ARRAY[null, null, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2) t(a)",
      "VALUES ARRAY[null, null, 1, 2], ARRAY[null, null, 1, 2], ARRAY[1, 2], ARRAY[1, 2]")
  }

  test("RANGE no-value frame bounds (TestWindowFrameRange.java:132)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 1, 1], " +
        "ARRAY[null, null, 1, 1], ARRAY[null, null, 1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN CURRENT ROW AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1, 1], ARRAY[1, 1], ARRAY[2]")
  }

  test("RANGE mixed bounds ascending nulls first (TestWindowFrameRange.java:172)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND 0.5 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null], " +
        "ARRAY[null, null], ARRAY[null, null, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN CURRENT ROW AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN 1.5 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[1, 1], ARRAY[1, 1], ARRAY[1, 1, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN 0.5 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], " +
        "ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST RANGE BETWEEN 0.5 FOLLOWING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 1, 1, 2], ARRAY[null, null, 1, 1, 2], ARRAY[2], ARRAY[2], null")
  }

  test("RANGE mixed bounds ascending nulls last (TestWindowFrameRange.java:230)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN UNBOUNDED PRECEDING AND 0.5 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES null, null, ARRAY[1, 1], ARRAY[1, 1, 2, null, null], ARRAY[1, 1, 2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN UNBOUNDED PRECEDING AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[1, 1, 2], " +
        "ARRAY[1, 1, 2, null, null], ARRAY[1, 1, 2, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN CURRENT ROW AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2], ARRAY[1, 1, 2], ARRAY[2], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 1.5 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1], ARRAY[1, 1], ARRAY[1, 1, 2], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 0.5 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[1, 1, 2, null, null], ARRAY[1, 1, 2, null, null], " +
        "ARRAY[2, null, null], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 0.5 FOLLOWING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2, null, null], ARRAY[2, null, null], ARRAY[null, null], " +
        "ARRAY[null, null], ARRAY[null, null]")
  }

  test("RANGE mixed bounds descending nulls first (TestWindowFrameRange.java:288)") {
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND 0.5 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null], " +
        "ARRAY[null, null, 2], ARRAY[null, null, 2]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN UNBOUNDED PRECEDING AND 0.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[null, null, 2], " +
        "ARRAY[null, null, 2, 1, 1], ARRAY[null, null, 2, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN CURRENT ROW AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[2, 1, 1], ARRAY[1, 1], ARRAY[1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN 1.5 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null], ARRAY[null, null], ARRAY[2], ARRAY[2, 1, 1], ARRAY[2, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN 1.5 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 2, 1, 1], ARRAY[null, null, 2, 1, 1], " +
        "ARRAY[2, 1, 1], ARRAY[2, 1, 1], ARRAY[2, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS FIRST RANGE BETWEEN 1.5 FOLLOWING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[null, null, 2, 1, 1], ARRAY[null, null, 2, 1, 1], null, null, null")
  }

  test("RANGE mixed bounds descending nulls last (TestWindowFrameRange.java:346)") {
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN UNBOUNDED PRECEDING AND 0.5 PRECEDING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES null, ARRAY[2], ARRAY[2], ARRAY[2, 1, 1, null, null], ARRAY[2, 1, 1, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN UNBOUNDED PRECEDING AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2, 1, 1], ARRAY[2, 1, 1], ARRAY[2, 1, 1], " +
        "ARRAY[2, 1, 1, null, null], ARRAY[2, 1, 1, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN CURRENT ROW AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2, 1, 1], ARRAY[1, 1], ARRAY[1, 1], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 0.5 PRECEDING AND CURRENT ROW) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2], ARRAY[1, 1], ARRAY[1, 1], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 0.5 PRECEDING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES ARRAY[2, 1, 1, null, null], ARRAY[1, 1, null, null], " +
        "ARRAY[1, 1, null, null], ARRAY[null, null], ARRAY[null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 1.5 FOLLOWING AND UNBOUNDED FOLLOWING) " +
      "FROM (VALUES 1, null, null, 2, 1) t(a)",
      "VALUES CAST(ARRAY[null, null] AS array(integer)), ARRAY[null, null], " +
        "ARRAY[null, null], ARRAY[null, null], ARRAY[null, null]")
  }

  test("RANGE empty input / empty frame (TestWindowFrameRange.java:404)") {
    vEmpty("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (SELECT 1 WHERE false) t(a)")
    vEmpty("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE UNBOUNDED PRECEDING) " +
      "FROM (SELECT 1 WHERE false) t(a)")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 1 PRECEDING AND 10 PRECEDING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES CAST(null AS array(integer)), null, null, null, null, " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a DESC NULLS LAST RANGE BETWEEN 10 FOLLOWING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 2, 3, null, null, 2, 1, null, null) t(a)",
      "VALUES CAST(null AS array(integer)), null, null, null, null, " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null], " +
        "ARRAY[null, null, null, null], ARRAY[null, null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 0.5 FOLLOWING AND 1.5 FOLLOWING) " +
      "FROM (VALUES 1, 2, 4) t(a)",
      "VALUES ARRAY[2], null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES 1.0, 1.1) t(a)",
      "VALUES CAST(null AS array(decimal(2, 1))), null")
    v("SELECT array_agg(a) OVER(ORDER BY a NULLS LAST RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES 1.0, 1.1, null) t(a)",
      "VALUES CAST(null AS array(decimal(2, 1))), null, ARRAY[null]")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 1.0, 1.1) t(a)",
      "VALUES CAST(null AS array(decimal(2, 1))), null")
    v("SELECT array_agg(a) OVER(ORDER BY a NULLS FIRST RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES null, 1.0, 1.1) t(a)",
      "VALUES CAST(ARRAY[null] AS array(decimal(2,1))), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 1, 2) t(a)",
      "VALUES null, ARRAY[1]")
    v("SELECT array_agg(a) OVER(ORDER BY a NULLS FIRST RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES null, 1, 2) t(a)",
      "VALUES ARRAY[null], null, ARRAY[1]")
    v("SELECT array_agg(a) OVER(ORDER BY a NULLS FIRST RANGE BETWEEN 2 PRECEDING AND 1.5 PRECEDING) " +
      "FROM (VALUES null, 1, 2) t(a)",
      "VALUES CAST(ARRAY[null] AS array(integer)), null, null")
  }

  test("RANGE only nulls / same values / zero offset (TestWindowFrameRange.java:498)") {
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES CAST(null AS integer), null, null) t(a)",
      "VALUES CAST(ARRAY[null, null, null] AS array(integer)), " +
        "ARRAY[null, null, null], ARRAY[null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES CAST(null AS integer), null, null) t(a)",
      "VALUES CAST(ARRAY[null, null, null] AS array(integer)), " +
        "ARRAY[null, null, null], ARRAY[null, null, null]")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING) " +
      "FROM (VALUES 1, 1, 1) t(a)",
      "VALUES CAST(null AS array(integer)), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) " +
      "FROM (VALUES 1, 1, 1) t(a)",
      "VALUES CAST(null AS array(integer)), null, null")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES 1, 1, 1) t(a)",
      "VALUES ARRAY[1, 1, 1], ARRAY[1, 1, 1], ARRAY[1, 1, 1]")
    v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS LAST RANGE BETWEEN 0 PRECEDING AND 0 FOLLOWING) " +
      "FROM (VALUES 1, 2, 1, null) t(a)",
      "VALUES ARRAY[1, 1], ARRAY[1, 1], ARRAY[2], ARRAY[null]")
  }

  test("RANGE non-constant offsets (TestWindowFrameRange.java:553)") {
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN x * 10 PRECEDING AND y / 10.0 FOLLOWING) " +
      "FROM (VALUES (1, 0.1, 10), (2, 0.2, 20), (4, 0.4, 40)) t(a, x, y)",
      "VALUES ARRAY[1, 2], ARRAY[1, 2, 4], ARRAY[1, 2, 4]")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN x * 10 PRECEDING AND y / 10.0 FOLLOWING) " +
      "FROM (VALUES (1, 0.1, 10), (2, 0.2, 20), (4, 0.4, 40), (null, 0.5, 50)) t(a, x, y)",
      "VALUES ARRAY[1, 2], ARRAY[1, 2, 4], ARRAY[1, 2, 4], ARRAY[null]")
  }

  test("RANGE invalid offsets raise (TestWindowFrameRange.java:572)") {
    vErr("SELECT array_agg(a) OVER(ORDER BY a ASC RANGE x PRECEDING) " +
      "FROM (VALUES (1, 0.1), (2, -0.2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a ASC RANGE BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 0.1), (2, -0.2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE x PRECEDING) " +
      "FROM (VALUES (1, 0.1), (2, -0.2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 0.1), (2, -0.2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE x PRECEDING) " +
      "FROM (VALUES (1, 0.1), (2, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 0.1), (2, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 0.1), (null, null)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a DESC RANGE BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 0.1), (null, -0.1)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (1, BIGINT '-1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (1, INTEGER '-1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (SMALLINT '1', SMALLINT '-1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (TINYINT '1', TINYINT '-1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (1, -1.1e0)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (1, REAL '-1.1')) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) FROM (VALUES (1, -1.0001)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) " +
      "FROM (VALUES (DATE '2001-01-31', INTERVAL '-1' YEAR)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) " +
      "FROM (VALUES (DATE '2001-01-31', INTERVAL '-1' MONTH)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a RANGE x PRECEDING) " +
      "FROM (VALUES (DATE '2001-01-31', INTERVAL '-1' DAY)) t(a, x)")
  }

  test("RANGE window partitioning (TestWindowFrameRange.java:662)") {
    v("SELECT a, p, array_agg(a) OVER(PARTITION BY p ORDER BY a ASC NULLS FIRST RANGE BETWEEN 0.5 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES (1, 'x'), (2, 'x'), (null, 'x'), (null, 'y'), (2, 'y')) t(a, p)",
      "VALUES (null, 'x', ARRAY[null]), (1, 'x', ARRAY[1, 2]), (2, 'x', ARRAY[2]), " +
        "(null, 'y', ARRAY[null]), (2, 'y', ARRAY[2])")
    v("SELECT a, p, array_agg(a) OVER(PARTITION BY p ORDER BY a ASC NULLS FIRST RANGE BETWEEN 0.5 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES (1, 'x'), (2, 'x'), (null, 'x'), (null, 'y'), (2, 'y'), (null, null), (null, null), (1, null)) t(a, p)",
      "VALUES (null, null, ARRAY[null, null]), (null, null, ARRAY[null, null]), " +
        "(1, null, ARRAY[1]), (null, 'x', ARRAY[null]), (1, 'x', ARRAY[1, 2]), " +
        "(2, 'x', ARRAY[2]), (null, 'y', ARRAY[null]), (2, 'y', ARRAY[2])")
  }

  test("RANGE offset types (TestWindowFrameRange.java:687)") {
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN DOUBLE '0.5' PRECEDING AND TINYINT '1' FOLLOWING) " +
      "FROM (VALUES 1, null, 2) t(a)",
      "VALUES ARRAY[1, 2], ARRAY[2], ARRAY[null]")
    v("SELECT array_agg(a) OVER(ORDER BY a RANGE BETWEEN 0.5 PRECEDING AND 1.000 FOLLOWING) " +
      "FROM (VALUES REAL '1', null, 2) t(a)",
      "VALUES ARRAY[REAL '1', REAL '2'], ARRAY[REAL '2'], ARRAY[null]")
    v("SELECT x, array_agg(x) OVER(ORDER BY x DESC RANGE BETWEEN interval '1' month PRECEDING AND interval '1' month FOLLOWING) " +
      "FROM (VALUES DATE '2001-01-31', DATE '2001-08-25', DATE '2001-09-25', DATE '2001-09-26') t(x)",
      "VALUES (DATE '2001-09-26', ARRAY[DATE '2001-09-26', DATE '2001-09-25']), " +
        "(DATE '2001-09-25', ARRAY[DATE '2001-09-26', DATE '2001-09-25', DATE '2001-08-25']), " +
        "(DATE '2001-08-25', ARRAY[DATE '2001-09-25', DATE '2001-08-25']), " +
        "(DATE '2001-01-31', ARRAY[DATE '2001-01-31'])")
    v("SELECT x, array_agg(x) OVER(ORDER BY x RANGE BETWEEN CURRENT ROW AND interval '1' month FOLLOWING) " +
      "FROM (VALUES DATE '2001-01-31', DATE '2001-02-28', DATE '2001-03-01') t(x)",
      "VALUES (DATE '2001-01-31', ARRAY[DATE '2001-01-31', DATE '2001-02-28']), " +
        "(DATE '2001-02-28', ARRAY[DATE '2001-02-28', DATE '2001-03-01']), " +
        "(DATE '2001-03-01', ARRAY[DATE '2001-03-01'])")
    v("SELECT x, array_agg(x) OVER(ORDER BY x RANGE BETWEEN interval '1' year PRECEDING AND interval '1' month FOLLOWING) " +
      "FROM (VALUES INTERVAL '1' month, INTERVAL '2' month, INTERVAL '5' year) t(x)",
      "VALUES (INTERVAL '1' month, ARRAY[INTERVAL '1' month, INTERVAL '2' month]), " +
        "(INTERVAL '2' month, ARRAY[INTERVAL '1' month, INTERVAL '2' month]), " +
        "(INTERVAL '5' year, ARRAY[INTERVAL '5' year])")
  }

  test("RANGE multiple window functions (TestWindowFrameRange.java:731)") {
    v("SELECT x, array_agg(date) OVER(ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), " +
      "avg(number) OVER(ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
      "FROM (VALUES (2, DATE '2222-01-01', 4.4), (1, DATE '1111-01-01', 2.2), (3, DATE '3333-01-01', 6.6)) t(x, date, number)",
      "VALUES (1, ARRAY[DATE '1111-01-01', DATE '2222-01-01'], 3.3), " +
        "(2, ARRAY[DATE '1111-01-01', DATE '2222-01-01', DATE '3333-01-01'], 4.4), " +
        "(3, ARRAY[DATE '2222-01-01', DATE '3333-01-01'], 5.5)")
    v("SELECT x, array_agg(a) OVER(ORDER BY x RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), " +
      "array_agg(a) OVER(ORDER BY x RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING) " +
      "FROM (VALUES (1.0, 1), (2.0, 2), (3.0, 3), (4.0, 4), (5.0, 5), (6.0, 6)) t(x, a)",
      "VALUES (1.0, ARRAY[1], ARRAY[1, 2, 3]), (2.0, ARRAY[1, 2], ARRAY[2, 3, 4]), " +
        "(3.0, ARRAY[1, 2, 3], ARRAY[3, 4, 5]), (4.0, ARRAY[2, 3, 4], ARRAY[4, 5, 6]), " +
        "(5.0, ARRAY[3, 4, 5], ARRAY[5, 6]), (6.0, ARRAY[4, 5, 6], ARRAY[6])")
  }

  // ===================================== named windows + FILTER (advice r15)

  test("windowed array_agg FILTER over a NAMED window keeps the window name") {
    // r15 advice: the transform wrapper's close-paren landed before the
    // window identifier, producing unparseable SQL
    v("SELECT array_agg(a) FILTER (WHERE a > 1) OVER w " +
      "FROM (VALUES 1, 2, 3) t(a) WINDOW w AS (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
      "VALUES CAST(null AS array(integer)), ARRAY[2], ARRAY[2, 3]")
    // plain array_agg over a named window: null-keeping + empty->NULL
    v("SELECT array_agg(a) OVER w FROM (VALUES 1, null, 2) t(a) " +
      "WINDOW w AS (ORDER BY a ASC NULLS FIRST ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
      "VALUES ARRAY[null], ARRAY[null, 1], ARRAY[1, 2]")
  }

  test("THEN/ELSE-position IN-subqueries are three-valued (advice r15)") {
    v("SELECT max(CASE WHEN a THEN x IN (SELECT v FROM (VALUES 1, CAST(NULL AS INTEGER)) u(v)) END) " +
      "FROM (VALUES (true, 2)) t(a, x)",
      "VALUES CAST(NULL AS BOOLEAN)")
    v("SELECT CASE WHEN a THEN 0 ELSE CASE WHEN x IN (SELECT v FROM (VALUES 1) u(v)) THEN 1 END END " +
      "FROM (VALUES (false, 1)) t(a, x)",
      "VALUES 1")
  }

  // ================================================== TestWindowFrameRows

  test("ROWS frames with per-row offsets (reference FrameInfo channel offsets)") {
    // positions over distinct keys coincide with the GROUPS analog
    // (TestWindowFrameGroups testNonConstantOffset), on a row_number axis
    v("SELECT array_agg(a) OVER(ORDER BY a ROWS BETWEEN x PRECEDING AND y FOLLOWING) " +
      "FROM (VALUES ('a', 1, 1), ('b', 2, 0), ('c', 0, 3)) t(a, x, y)",
      "VALUES ARRAY['a', 'b'], ARRAY['a', 'b'], ARRAY['c']")
    v("SELECT array_agg(a) OVER(ORDER BY a ROWS BETWEEN x FOLLOWING AND y FOLLOWING) " +
      "FROM (VALUES ('a', 1, 1), ('b', 2, 0), ('c', 3, 3), ('d', 0, 0)) t(a, x, y)",
      "VALUES ARRAY['b'], null, null, ARRAY['d']")
    vErr("SELECT array_agg(a) OVER(ORDER BY a ROWS x PRECEDING) " +
      "FROM (VALUES (1, 1), (2, -2)) t(a, x)")
    vErr("SELECT array_agg(a) OVER(ORDER BY a ROWS BETWEEN 1 PRECEDING AND x FOLLOWING) " +
      "FROM (VALUES (1, 1), (2, null)) t(a, x)")
  }

  test("ROWS offset types incl. overflowing decimals (TestWindowFrameRows.java:46)") {
    val expected = "VALUES ARRAY[null, null, 1], ARRAY[null, null, 1, 2], " +
      "ARRAY[null, 1, 2, 2], ARRAY[1, 2, 2], ARRAY[2, 2]"
    for (ty <- Seq("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "DECIMAL"))
      v(s"SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST ROWS BETWEEN $ty '1' PRECEDING AND $ty '2' FOLLOWING) " +
        "FROM (VALUES 2, 2, 1, null, null) t(a)", expected)
    val expectedAll = "VALUES ARRAY[null, null, 1, 2, 2], ARRAY[null, null, 1, 2, 2], " +
      "ARRAY[null, 1, 2, 2], ARRAY[1, 2, 2], ARRAY[2, 2]"
    for (big <- Seq("4294967297", "9223372036854775807", "9223372036854775808",
      "999999999999999999999999999999"))
      v("SELECT array_agg(a) OVER(ORDER BY a ASC NULLS FIRST ROWS BETWEEN 1 PRECEDING AND " +
        s"DECIMAL '$big' FOLLOWING) FROM (VALUES 2, 2, 1, null, null) t(a)",
        expectedAll)
  }
}
