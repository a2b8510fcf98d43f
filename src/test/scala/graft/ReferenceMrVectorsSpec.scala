package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference engine's OWN published MATCH_RECOGNIZE behavioral
  * vectors, replayed through this engine's SQL front-end — inputs,
  * queries, and expected outputs transcribed from
  * `core/trino-main/src/test/java/io/trino/sql/query/TestRowPatternMatching.java`
  * (cited per test). This is the strongest parity evidence available:
  * the reference asserts these exact rows for these exact queries. */
class ReferenceMrVectorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-mr-vectors", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run a MATCH_RECOGNIZE body over (id, value) rows; return the
    * selected columns as a multiset of stringified tuples. */
  private def run(rows: Seq[(Int, Int)], body: String,
      select: Seq[String]): Seq[Seq[String]] = {
    val spk = spark
    import spk.implicits._
    val df = rows.toDF("id", "value")
    graft.sqlcompat.MatchRecognizeSql
      .translate(s"SELECT * FROM t MATCH_RECOGNIZE ( $body )", _ => df)
      .selectExpr(select: _*)
      .collect().toSeq
      .map(r => select.indices.map(i => if (r.isNullAt(i)) "ø" else r.get(i).toString))
      .sortBy(_.mkString("|"))
  }

  private def expect(rows: (Any, Any, Any, Any)*): Seq[Seq[String]] =
    rows.map { case (a, b, c, d) => Seq(a, b, c, d).map {
      case null => "ø"
      case v => v.toString
    }}.sortBy(_.mkString("|"))

  test("testSimpleQuery vector (TestRowPatternMatching.java:45)") {
    val got = run(
      Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 90, 6 -> 50, 7 -> 40, 8 -> 60),
      """ORDER BY id
        |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
        |         CLASSIFIER() AS label
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B+ C+)
        |DEFINE B AS B.value < PREV (B.value),
        |       C AS C.value > PREV (C.value)""".stripMargin,
      Seq("id", "mno", "val", "label"))
    assert(got == expect(
      (1, 1, 90, "A"), (2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 80, "C"),
      (5, 1, 90, "C"), (6, 2, 50, "A"), (7, 2, 40, "B"), (8, 2, 60, "C")))
  }

  test("testPatternQuantifiers vectors (TestRowPatternMatching.java:176)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 70)
    def q(pattern: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |ALL ROWS PER MATCH
         |AFTER MATCH SKIP PAST LAST ROW
         |PATTERN ($pattern)
         |DEFINE B AS B.value <= PREV (B.value)""".stripMargin,
      Seq("id", "mno", "val", "label"))
    // B*: empty match at row 1, then rows 2-4 as match 2
    assert(q("B*") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 2, 70, "B"), (4, 2, 70, "B")))
    // B*?: reluctant — an empty match at every row
    assert(q("B*?") == expect(
      (1, 1, null, null), (2, 2, null, null), (3, 3, null, null), (4, 4, null, null)))
    // B+: one match over rows 2-4
    assert(q("B+") == expect((2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 70, "B")))
    // B+?: reluctant — three single-row matches
    assert(q("B+?") == expect((2, 1, 80, "B"), (3, 2, 70, "B"), (4, 3, 70, "B")))
    // B?: empty at row 1, then single-row matches
    assert(q("B?") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 3, 70, "B"), (4, 4, 70, "B")))
    // B??: reluctant — empty everywhere
    assert(q("B??") == expect(
      (1, 1, null, null), (2, 2, null, null), (3, 3, null, null), (4, 4, null, null)))
    // B{,} ≡ B*
    assert(q("B{,}") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 2, 70, "B"), (4, 2, 70, "B")))
    // B{1,} ≡ B+
    assert(q("B{1,}") == expect((2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 70, "B")))
  }

  test("testAfterMatchSkip vectors (TestRowPatternMatching.java:731)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 70, 6 -> 80)
    def q(skip: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |ALL ROWS PER MATCH
         |AFTER MATCH SKIP $skip
         |PATTERN (A B+ C+ D?)
         |SUBSET U = (C, D)
         |DEFINE B AS B.value < PREV (B.value),
         |       C AS C.value > PREV (C.value),
         |       D AS false""".stripMargin,
      Seq("id", "mno", "val", "label"))
    assert(q("PAST LAST ROW") == expect(
      (1, 1, 90, "A"), (2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 80, "C")))
    assert(q("TO NEXT ROW") == expect(
      (1, 1, 90, "A"), (2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 80, "C"),
      (2, 2, 80, "A"), (3, 2, 70, "B"), (4, 2, 80, "C"),
      (4, 3, 80, "A"), (5, 3, 70, "B"), (6, 3, 80, "C")))
    val toFirstC = expect(
      (1, 1, 90, "A"), (2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 80, "C"),
      (4, 2, 80, "A"), (5, 2, 70, "B"), (6, 2, 80, "C"))
    assert(q("TO FIRST C") == toFirstC)
    assert(q("TO LAST B") == toFirstC)  // same rows per the reference
    assert(q("TO B") == toFirstC)       // bare TO v defaults to LAST
    assert(q("TO U") == toFirstC)       // subset target resolves to last C
    // skipping to the match's first row must fail (infinite loop guard)
    val e1 = intercept[Exception](q("TO A"))
    assert(e1.toString.contains("first row") || e1.getCause != null)
    // skipping to a variable absent from the match must fail
    val e2 = intercept[Exception](q("TO D"))
    assert(e2.toString.nonEmpty)
  }

  test("testRowPattern vectors (TestRowPatternMatching.java:83)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 70)
    def q(patternAndDefine: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |ALL ROWS PER MATCH
         |AFTER MATCH SKIP PAST LAST ROW
         |$patternAndDefine""".stripMargin,
      Seq("id", "mno", "val", "label"))
    // empty pattern in the preferred alternation branch
    assert(q("PATTERN (() | A) DEFINE A AS true") == expect(
      (1, 1, null, null), (2, 2, null, null), (3, 3, null, null), (4, 4, null, null)))
    // partition anchors
    assert(q("PATTERN (^A) DEFINE A AS true") == expect((1, 1, 90, "A")))
    assert(q("PATTERN (A^) DEFINE A AS true") == expect())
    assert(q("PATTERN (^A^) DEFINE A AS true") == expect())
    assert(q("PATTERN (A$) DEFINE A AS true") == expect((4, 1, 70, "A")))
    assert(q("PATTERN ($A) DEFINE A AS true") == expect())
    assert(q("PATTERN ($A$) DEFINE A AS true") == expect())
    // concatenation
    assert(q("""PATTERN (A B C)
                |DEFINE B AS B.value < PREV (B.value),
                |       C AS C.value = PREV (C.value)""".stripMargin) == expect(
      (2, 1, 80, "A"), (3, 1, 70, "B"), (4, 1, 70, "C")))
    // alternation: first declared alternative preferred
    assert(q("""PATTERN (B | C | A)
                |DEFINE B AS B.value < PREV (B.value),
                |       C AS C.value <= PREV (C.value)""".stripMargin) == expect(
      (1, 1, 90, "A"), (2, 2, 80, "B"), (3, 3, 70, "B"), (4, 4, 70, "C")))
    // PERMUTE: lexicographically first permutation preferred
    assert(q("""PATTERN (PERMUTE(B, C))
                |DEFINE B AS B.value < PREV (B.value),
                |       C AS C.value < PREV (C.value)""".stripMargin) == expect(
      (2, 1, 80, "B"), (3, 1, 70, "C")))
    // grouped pattern
    assert(q("""PATTERN (((A) (B (C))))
                |DEFINE B AS B.value < PREV (B.value),
                |       C AS C.value = PREV (C.value)""".stripMargin) == expect(
      (2, 1, 80, "A"), (3, 1, 70, "B"), (4, 1, 70, "C")))
  }

  test("testExclusionSyntax vectors (TestRowPatternMatching.java:382)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 90, 6 -> 50, 7 -> 40, 8 -> 60)
    def q(pattern: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |ALL ROWS PER MATCH
         |AFTER MATCH SKIP PAST LAST ROW
         |PATTERN ($pattern)
         |DEFINE B AS B.value < PREV (B.value),
         |       C AS C.value > PREV (C.value)""".stripMargin,
      Seq("id", "mno", "val", "label"))
    val full = expect(
      (1, 1, 90, "A"), (2, 1, 80, "B"), (3, 1, 70, "B"), (4, 1, 80, "C"),
      (5, 1, 90, "C"), (6, 2, 50, "A"), (7, 2, 40, "B"), (8, 2, 60, "C"))
    assert(q("A B+ C+") == full)
    assert(q("A {- B+ -} C+") == expect(
      (1, 1, 90, "A"), (4, 1, 80, "C"), (5, 1, 90, "C"),
      (6, 2, 50, "A"), (8, 2, 60, "C")))
    assert(q("{- A -} {- B+ -} C+") == expect(
      (4, 1, 80, "C"), (5, 1, 90, "C"), (8, 2, 60, "C")))
    assert(q("A {- {- B+ -} C+ -}") == expect((1, 1, 90, "A"), (6, 2, 50, "A")))
    assert(q("{- A B+ C+ -}") == expect())
    assert(q("A B+ {- ()* -} C+") == full)
    assert(q("A {- B -}+ {- C -}+") == expect((1, 1, 90, "A"), (6, 2, 50, "A")))
    assert(q("A {- B -}* {- C -}*") == expect((1, 1, 90, "A"), (6, 2, 50, "A")))
    assert(q("A {- B -}{1,2} {- C -}{1,2}") == expect((1, 1, 90, "A"), (6, 2, 50, "A")))
    assert(q("A {- C -}{2,3} {- B -}{2,3}") == expect((3, 1, 70, "A")))
  }

  test("testEmptyCycle vectors (TestRowPatternMatching.java:550)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 70)
    def q(pattern: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |ALL ROWS PER MATCH
         |AFTER MATCH SKIP PAST LAST ROW
         |PATTERN ($pattern)
         |DEFINE B AS B.value < PREV (B.value)""".stripMargin,
      Seq("id", "mno", "val", "label"))
    val allEmpty = expect(
      (1, 1, null, null), (2, 2, null, null), (3, 3, null, null), (4, 4, null, null))
    assert(q("()* | B") == allEmpty)
    assert(q("()+ | B") == allEmpty)
    assert(q("(){5,} | B") == allEmpty)
    assert(q("B | ()*") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 3, 70, "B"), (4, 4, null, null)))
    assert(q("(B ()*)*") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 2, 70, "B"), (4, 3, null, null)))
    assert(q("(B ()*)*?") == allEmpty)
    assert(q("^* | B") == allEmpty)
    assert(q("^+ | B") == expect(
      (1, 1, null, null), (2, 2, 80, "B"), (3, 3, 70, "B")))
    assert(q("^* A B") == expect((1, 1, 90, "A"), (2, 1, 80, "B")))
    assert(q("$* | B") == allEmpty)
    assert(q("$+ | B") == expect((2, 1, 80, "B"), (3, 2, 70, "B")))
    assert(q("B A $+") == expect((3, 1, 70, "B"), (4, 1, 70, "A")))
  }

  test("testBackReference vectors (TestRowPatternMatching.java:480)") {
    // cross-variable DEFINE references resolve to the running LAST of
    // the referenced variable's matched rows
    val spk = spark
    import spk.implicits._
    val df = Seq((1, 1), (2, 1)).toDF("id", "value")
    def q(define: String) = graft.sqlcompat.MatchRecognizeSql.translate(
      s"""SELECT * FROM t MATCH_RECOGNIZE (
         |  ORDER BY id
         |  MEASURES CLASSIFIER() AS classy
         |  ALL ROWS PER MATCH
         |  PATTERN ((A | B)* X)
         |  DEFINE X AS $define
         |)""".stripMargin, _ => df)
      .selectExpr("value", "classy").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._2).toSeq
    assert(q("value = A.value") == Seq((1, "A"), (1, "X")))
    assert(q("value = B.value") == Seq((1, "B"), (1, "X")))
  }

  test("testOutputModes vectors (TestRowPatternMatching.java:651)") {
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 70)
    def q(mode: String, pattern: String) = run(in,
      s"""ORDER BY id
         |MEASURES MATCH_NUMBER() AS mno, RUNNING LAST(value) AS val,
         |         CLASSIFIER() AS label
         |$mode
         |AFTER MATCH SKIP PAST LAST ROW
         |PATTERN ($pattern)
         |DEFINE B AS B.value < PREV (B.value)""".stripMargin,
      Seq("mno", "val", "label"))
    def ex3(rows: (Any, Any, Any)*) = rows.map { case (a, b, c) =>
      Seq(a, b, c).map { case null => "ø"; case v => v.toString }
    }.sortBy(_.mkString("|"))
    // ONE ROW PER MATCH shows empty matches by default; CLASSIFIER()
    // is the last matched row's label
    val oneRowBStar = ex3((1, null, null), (2, 70, "B"), (3, null, null))
    assert(q("ONE ROW PER MATCH", "B*") == oneRowBStar)
    // defaults to ONE ROW PER MATCH when the clause is absent
    assert(q("", "B*") == oneRowBStar)
    // ONE ROW PER MATCH omits unmatched rows
    assert(q("ONE ROW PER MATCH", "B+") == ex3((1, 70, "B")))
    // ALL ROWS shows empty matches by default, omits unmatched rows
    assert(q("ALL ROWS PER MATCH", "B*") == ex3(
      (1, null, null), (2, 80, "B"), (2, 70, "B"), (3, null, null)))
    assert(q("ALL ROWS PER MATCH", "B+") == ex3((1, 80, "B"), (1, 70, "B")))
    assert(q("ALL ROWS PER MATCH SHOW EMPTY MATCHES", "B*") == ex3(
      (1, null, null), (2, 80, "B"), (2, 70, "B"), (3, null, null)))
    assert(q("ALL ROWS PER MATCH OMIT EMPTY MATCHES", "B*") == ex3(
      (2, 80, "B"), (2, 70, "B")))
    assert(q("ALL ROWS PER MATCH OMIT EMPTY MATCHES", "B+") == ex3(
      (1, 80, "B"), (1, 70, "B")))
    assert(q("ALL ROWS PER MATCH WITH UNMATCHED ROWS", "B+") == ex3(
      (null, null, null), (1, 80, "B"), (1, 70, "B"), (null, null, null)))
  }

  test("testPartitioningAndOrdering vectors (TestRowPatternMatching.java:1216)") {
    val spk = spark
    import spk.implicits._
    // multiple partitions, deliberately unordered input (match/label
    // projection of the reference's expected rows)
    val multi = Seq((1, "p1", 90), (2, "p1", 80), (6, "p1", 80), (2, "p2", 20),
      (2, "p3", 60), (1, "p3", 50), (3, "p1", 70), (4, "p1", 80), (5, "p1", 90),
      (1, "p2", 20), (3, "p3", 70), (3, "p2", 10)).toDF("id", "part", "value")
    val got = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY part
        |  ORDER BY id
        |  MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS label
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (B+)
        |  DEFINE B AS B.value < PREV (B.value)
        |)""".stripMargin, _ => multi)
      .selectExpr("part", "id", "mno", "label").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(("p1", 2, 1L, "B"), ("p1", 3, 1L, "B"), ("p1", 6, 2L, "B"),
      ("p2", 3, 1L, "B")))
    // empty input
    val empty = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY part
        |  ORDER BY id
        |  MEASURES MATCH_NUMBER() AS mno
        |  ALL ROWS PER MATCH
        |  PATTERN (B+)
        |  DEFINE B AS B.value < PREV (B.value)
        |)""".stripMargin, _ => multi.filter("false"))
    assert(empty.count() == 0)
    // no measures at all: output is the input columns of matched rows
    val noMeas = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY part
        |  ORDER BY id
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (B+)
        |  DEFINE B AS B.value < PREV (B.value)
        |)""".stripMargin,
      _ => Seq((5, "p2", 10), (2, "p1", 90), (1, "p1", 80), (4, "p2", 20),
        (3, "p1", 30)).toDF("id", "part", "value"))
      .selectExpr("id", "part").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(identity).toSeq
    assert(noMeas == Seq((3, "p1"), (5, "p2")))
  }

  test("aggregation vectors (TestAggregationsInRowPatternMatching.java:40,712)") {
    val spk = spark
    import spk.implicits._
    // RUNNING sum over A* (A undefined → true): one match of all rows
    val sums = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  ORDER BY id
        |  MEASURES RUNNING sum(id) AS running_sum
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A*)
        |  DEFINE A AS true
        |)""".stripMargin, _ => (1 to 8).map(i => (i, i)).toDF("id", "value"))
      .selectExpr("id", "running_sum").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(sums == Seq((1, 1L), (2, 3L), (3, 6L), (4, 10L), (5, 15L),
      (6, 21L), (7, 28L), (8, 36L)))
    // count(*) and bare count(); match starts where X holds (id > 1)
    val counts = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  ORDER BY id
        |  MEASURES count(*) AS m1, count() AS m2
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (X Y Z)
        |  DEFINE X AS id > 1
        |)""".stripMargin,
      _ => Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value"))
      .selectExpr("id", "m1", "m2").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(counts == Seq((2, 1L, 1L), (3, 2L, 2L), (4, 3L, 3L)))
    // explicit RUNNING/FINAL count
    val rf = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  ORDER BY id
        |  MEASURES RUNNING count(*) AS m1, FINAL count(*) AS m2,
        |           RUNNING count() AS m3, FINAL count() AS m4
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B C D)
        |  DEFINE A AS true
        |)""".stripMargin,
      _ => Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value"))
      .selectExpr("id", "m1", "m2", "m3", "m4").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(rf == Seq((1, 1L, 4L, 1L, 4L), (2, 2L, 4L, 2L, 4L),
      (3, 3L, 4L, 3L, 4L), (4, 4L, 4L, 4L, 4L)))
    // count(C.*) / count(U.*) with a SUBSET union
    val vc = graft.sqlcompat.MatchRecognizeSql.translate(
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  ORDER BY id
        |  MEASURES count(C.*) AS m1, count(U.*) AS m2
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B C D)
        |  SUBSET U = (B, D)
        |  DEFINE A AS true
        |)""".stripMargin,
      _ => Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value"))
      .selectExpr("id", "m1", "m2").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(vc == Seq((1, 0L, 0L), (2, 0L, 1L), (3, 1L, 1L), (4, 1L, 2L)))
  }

  test("window-frame testSeek vector (TestAggregationsInRowPatternMatching.java:874)") {
    val spk = spark
    import spk.implicits._
    import org.apache.spark.sql.Row
    val in = Seq((1, "p1", "A"), (2, "p1", "B"), (3, "p1", "C"), (4, "p1", "D"),
      (5, "p1", "E"), (1, "p2", "A"), (2, "p2", "B"), (3, "p2", "C"),
      (4, "p2", "D"), (5, "p2", "E")).toDF("id", "part", "value")
    val xGt: (Row, Row) => Boolean = (_, c) => c.getAs[String]("value") > "B"
    val base = graft.operators.MatchRecognize.windowMatches(
      in, Seq("part"), Seq("id"), "X+",
      graft.operators.MatchRecognize.wrapSimple(Map("X" -> xGt)),
      valueCol = "value", seek = true)
    // the reference's two measures, derived from the arrays by Catalyst:
    // array_agg(value) and array_agg(value || CLASSIFIER())
    val got = base.selectExpr("part", "id", "match_vals AS m1",
        "transform(arrays_zip(match_vals, match_labels), " +
          "e -> concat(e.match_vals, e.match_labels)) AS m2")
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getSeq[String](2).mkString(","),
        if (r.isNullAt(3)) null else r.getSeq[String](3).mkString(",")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("p1", 1, "C,D,E", "CX,DX,EX"), ("p1", 2, "C,D,E", "CX,DX,EX"),
      ("p1", 3, "C,D,E", "CX,DX,EX"), ("p1", 4, "D,E", "DX,EX"),
      ("p1", 5, "E", "EX"),
      ("p2", 1, "C,D,E", "CX,DX,EX"), ("p2", 2, "C,D,E", "CX,DX,EX"),
      ("p2", 3, "C,D,E", "CX,DX,EX"), ("p2", 4, "D,E", "DX,EX"),
      ("p2", 5, "E", "EX")))
    // INITIAL (the default): only the current row anchors the match
    val initial = graft.operators.MatchRecognize.windowMatches(
      in, Seq("part"), Seq("id"), "X+",
      graft.operators.MatchRecognize.wrapSimple(Map("X" -> xGt)),
      valueCol = "value", seek = false)
      .selectExpr("part", "id", "match_vals").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getSeq[String](2).mkString(",")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(initial == Seq(
      ("p1", 1, null), ("p1", 2, null), ("p1", 3, "C,D,E"),
      ("p1", 4, "D,E"), ("p1", 5, "E"),
      ("p2", 1, null), ("p2", 2, null), ("p2", 3, "C,D,E"),
      ("p2", 4, "D,E"), ("p2", 5, "E")))
  }

  test("window-frame vectors (TestRowPatternMatchingInWindow.java:45,541)") {
    val spk = spark
    import spk.implicits._
    import org.apache.spark.sql.Row
    import graft.operators.MatchRecognize
    import graft.operators.MatchRecognize.SkipMode
    // testSimpleQuery: INITIAL + SKIP PAST LAST ROW — rows consumed by
    // a prior match never attempt, and get null measures; measures
    // evaluate FINAL (the match's last row)
    val in1 = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 90, 6 -> 50,
      7 -> 40, 8 -> 60).toDF("id", "value")
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Int]("value") < p.getAs[Int]("value")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Int]("value") > p.getAs[Int]("value")
    def lastish(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("id", "element_at(match_vals, -1) AS val",
        "element_at(match_labels, -1) AS label")
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1).toString,
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    val simple = lastish(MatchRecognize.windowMatches(
      in1, Nil, Seq("id"), "A B+ C+",
      MatchRecognize.wrapSimple(Map("B" -> down, "C" -> up)),
      valueCol = "value", skip = SkipMode.PastLastRow))
    assert(simple == Seq((1, "90", "C"), (2, null, null), (3, null, null),
      (4, null, null), (5, null, null), (6, "60", "C"), (7, null, null),
      (8, null, null)))
    // testAfterMatchSkipToPosition: alternation A B+ C+ | E, both skips
    val in2 = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 70, 6 -> 100)
      .toDF("id", "value")
    val defs = MatchRecognize.wrapSimple(Map("B" -> down, "C" -> up))
    val past = lastish(MatchRecognize.windowMatches(
      in2, Nil, Seq("id"), "A B+ C+ | E", defs,
      valueCol = "value", skip = SkipMode.PastLastRow))
    assert(past == Seq((1, "80", "C"), (2, null, null), (3, null, null),
      (4, null, null), (5, "70", "E"), (6, "100", "E")))
    val nextRow = lastish(MatchRecognize.windowMatches(
      in2, Nil, Seq("id"), "A B+ C+ | E", defs,
      valueCol = "value", skip = SkipMode.ToNextRow))
    assert(nextRow == Seq((1, "80", "C"), (2, "80", "C"), (3, "70", "E"),
      (4, "100", "C"), (5, "70", "E"), (6, "100", "E")))
  }

  test("testEmptyMatches unmatched-rows vector (TestRowPatternMatching.java:835)") {
    val got = run(
      Seq(1 -> 100, 2 -> 100, 3 -> 90, 4 -> 80, 5 -> 70, 6 -> 100),
      """ORDER BY id
        |MEASURES MATCH_NUMBER() AS mno, CLASSIFIER() AS label
        |ALL ROWS PER MATCH WITH UNMATCHED ROWS
        |AFTER MATCH SKIP TO NEXT ROW
        |PATTERN (A B{2})
        |DEFINE B AS B.value < PREV (B.value)""".stripMargin,
      Seq("id", "mno", "value", "label"))
    assert(got == expect(
      (1, null, 100, null),
      (2, 1, 100, "A"), (3, 1, 90, "B"), (4, 1, 80, "B"),
      (3, 2, 90, "A"), (4, 2, 80, "B"), (5, 2, 70, "B"),
      (6, null, 100, null)))
  }

  test("window-frame AFTER MATCH SKIP TO label vectors (TestRowPatternMatchingInWindow testAfterMatchSkipToLabel)") {
    val spk = spark
    import spk.implicits._
    import org.apache.spark.sql.Row
    import graft.operators.MatchRecognize
    import graft.operators.MatchRecognize.SkipMode
    val in = Seq(1 -> 90, 2 -> 80, 3 -> 70, 4 -> 80, 5 -> 70, 6 -> 100)
      .toDF("id", "value")
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Int]("value") < p.getAs[Int]("value")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Int]("value") > p.getAs[Int]("value")
    val never: (Row, Row) => Boolean = (_, _) => false
    val defs = MatchRecognize.wrapSimple(
      Map("B" -> down, "C" -> up, "D" -> never))
    def lastish(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("id", "element_at(match_vals, -1) AS val",
        "element_at(match_labels, -1) AS label")
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1).toString,
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    // A B B C matched at row 1 (skip to FIRST C = row 4 continues
    // immediately); A B C matched at row 4; rows 2, 3, 5, 6 skipped or
    // unmatched with null measures
    val toFirstC = lastish(MatchRecognize.windowMatches(
      in, Nil, Seq("id"), "A B+ C+ D?", defs,
      valueCol = "value", skip = SkipMode.ToFirst("C")))
    assert(toFirstC == Seq((1, "80", "C"), (2, null, null), (3, null, null),
      (4, "100", "C"), (5, null, null), (6, null, null)))
    // SKIP TO LAST B: row 3 attempts (and fails) after the first match
    val toLastB = lastish(MatchRecognize.windowMatches(
      in, Nil, Seq("id"), "A B+ C+ D?", defs,
      valueCol = "value", skip = SkipMode.ToLast("B")))
    assert(toLastB == Seq((1, "80", "C"), (2, null, null), (3, null, null),
      (4, "100", "C"), (5, null, null), (6, null, null)))
  }

  test("window-frame variable ROWS FOLLOWING bound vector (TestRowPatternMatchingInWindow testFrameBounds)") {
    val spk = spark
    import spk.implicits._
    // ROWS BETWEEN CURRENT ROW AND rows FOLLOWING — the bound is a
    // per-row COLUMN; MEASURES LAST(id) with PATTERN (A+), A AS true
    val in = Seq(1 -> 1, 2 -> 2, 3 -> 6, 4 -> 0, 5 -> 2).toDF("id", "rows")
    val got = graft.operators.MatchRecognize.windowMatches(
      in, Nil, Seq("id"), "A+",
      Map.empty[String, graft.operators.MatchRecognize.MatchCtx => Boolean],
      valueCol = "id", frameEndCol = Some("rows"))
      .selectExpr("id", "element_at(match_vals, -1) AS last_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(got == Seq(1 -> 2, 2 -> 4, 3 -> 5, 4 -> 4, 5 -> 5))
  }

  test("testPotentiallyExponentialMatch vector (TestRowPatternMatching.java: equivalent-thread pruning)") {
    // (A+)+ B over twenty rows of 1s with B never true: exponential
    // decompositions unless equivalent states prune — the matcher's
    // visited-state memo is exactly that (the reference prunes
    // equivalent Matcher threads). No PARTITION BY, no ORDER BY.
    val got = run(
      (1 to 20).map(i => i -> 1),
      """MEASURES CLASSIFIER() AS label
        |PATTERN ((A+)+ B)
        |DEFINE A AS value = 1, B AS value = 2""".stripMargin,
      Seq("label"))
    assert(got.isEmpty, s"expected no match, got $got")
  }
}
