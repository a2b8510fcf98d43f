package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference's aggregates-in-row-pattern-matching corpus
  * (`core/trino-main/src/test/java/io/trino/sql/query/
  * TestAggregationsInRowPatternMatching.java`), replayed through
  * `MatchRecognizeSql.translate`: running/final aggregates in
  * MEASURES, array_agg of columns and of CLASSIFIER, and — the r16
  * addition — running aggregates inside DEFINE (`sum(A.value) -
  * A.value <= sum(B.value)`), whose SQL:2016 running semantics
  * include the row being tentatively classified.
  *
  * The r17 additions replay
  * `TestCopyAggregationStateInRowPatternMatching.java` — per-thread
  * aggregation state at `(A | B)*` alternation forks, probed through
  * DEFINE aggregates with computed arguments (CLASSIFIER(), CAST,
  * MAP/ARRAY constructors), the min/max N-variants, min_by/max_by,
  * map_agg/multimap_agg/map_union, and array_join/element_at/
  * FIRST(CLASSIFIER()) wrappers.
  *
  * Out of scope (fail-loud exclusions, documented in
  * MatchRecognizeSql's header): aggregates whose ARGUMENTS mix labels
  * or need full scalar evaluation (`sum(MATCH_NUMBER() * 100)`,
  * `array_agg(value || CLASSIFIER())`), array comparisons in
  * DEFINE, and the WINDOW ... SEEK form with array measures.
  */
class ReferenceMrAggVectorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-mr-agg-vectors", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run a MATCH_RECOGNIZE body over `df`; stringify the selected
    * columns (arrays through CAST ... AS STRING) into a sorted
    * multiset. */
  private def run(df: DataFrame, body: String, select: Seq[String]): Seq[String] =
    graft.sqlcompat.MatchRecognizeSql
      .translate(s"SELECT * FROM t MATCH_RECOGNIZE ( $body )", _ => df)
      .selectExpr(select.map(c => s"CAST($c AS STRING)"): _*)
      .collect().toSeq
      .map(r => select.indices.map(i =>
        if (r.isNullAt(i)) "ø" else r.getString(i)).mkString("|"))
      .sorted

  private def expect(rows: String*): Seq[String] = rows.sorted

  test("running sum and classifier arrays (TestAggregationsInRowPatternMatching.java:40)") {
    val spk = spark; import spk.implicits._
    val t8 = (1 to 8).toDF("id")
    assert(run(t8,
      """ORDER BY id
        |MEASURES RUNNING sum(id) AS running_sum
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A*)
        |DEFINE A AS true""".stripMargin,
      Seq("id", "running_sum")) == expect(
      "1|1", "2|3", "3|6", "4|10", "5|15", "6|21", "7|28", "8|36"))
    assert(run(t8,
      """ORDER BY id
        |MEASURES RUNNING array_agg(CLASSIFIER(A)) AS running_labels
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A*)
        |DEFINE A AS true""".stripMargin,
      Seq("id", "running_labels")) == expect(
      "1|[A]", "2|[A, A]", "3|[A, A, A]", "4|[A, A, A, A]",
      "5|[A, A, A, A, A]", "6|[A, A, A, A, A, A]",
      "7|[A, A, A, A, A, A, A]", "8|[A, A, A, A, A, A, A, A]"))
  }

  test("partitioned running sums across matches (TestAggregationsInRowPatternMatching.java:145)") {
    val spk = spark; import spk.implicits._
    val df = Seq(
      (1, "p1", 1), (2, "p1", 1), (6, "p1", 1), (2, "p2", 10), (2, "p3", 100),
      (1, "p3", 100), (3, "p1", 1), (4, "p1", 1), (5, "p1", 1), (1, "p2", 10),
      (3, "p3", 100), (3, "p2", 10)).toDF("id", "part", "value")
    assert(run(df,
      """PARTITION BY part
        |ORDER BY id
        |MEASURES RUNNING sum(value) AS running_sum
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (B+)
        |DEFINE B AS true""".stripMargin,
      Seq("part", "id", "running_sum")) == expect(
      "p1|1|1", "p1|2|2", "p1|3|3", "p1|4|4", "p1|5|5", "p1|6|6",
      "p2|1|10", "p2|2|20", "p2|3|30",
      "p3|1|100", "p3|2|200", "p3|3|300"))
    assert(run(df,
      """PARTITION BY part
        |ORDER BY id
        |MEASURES RUNNING sum(value) AS running_sum, MATCH_NUMBER() AS match_no
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP TO NEXT ROW
        |PATTERN (B+)
        |DEFINE B AS true""".stripMargin,
      Seq("part", "match_no", "id", "running_sum")) == expect(
      "p1|1|1|1", "p1|1|2|2", "p1|1|3|3", "p1|1|4|4", "p1|1|5|5", "p1|1|6|6",
      "p1|2|2|1", "p1|2|3|2", "p1|2|4|3", "p1|2|5|4", "p1|2|6|5",
      "p1|3|3|1", "p1|3|4|2", "p1|3|5|3", "p1|3|6|4",
      "p1|4|4|1", "p1|4|5|2", "p1|4|6|3",
      "p1|5|5|1", "p1|5|6|2", "p1|6|6|1",
      "p2|1|1|10", "p2|1|2|20", "p2|1|3|30",
      "p2|2|2|10", "p2|2|3|20", "p2|3|3|10",
      "p3|1|1|100", "p3|1|2|200", "p3|1|3|300",
      "p3|2|2|100", "p3|2|3|200", "p3|3|3|100"))
  }

  test("tentative-label aggregates in DEFINE (TestAggregationsInRowPatternMatching.java:258)") {
    val spk = spark; import spk.implicits._
    // avg(B.value) in DEFINE A: the current row tentatively labeled A
    // does NOT feed B's aggregate
    assert(run(Seq((1, 4), (2, 6), (3, 0)).toDF("id", "value"),
      """ORDER BY id
        |MEASURES RUNNING avg(B.value) AS running_avg_B, CLASSIFIER() AS classy
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)*)
        |DEFINE A AS avg(B.value) = 5""".stripMargin,
      Seq("id", "classy", "running_avg_B")) == expect(
      "1|B|4.0", "2|B|5.0", "3|A|5.0"))
    // avg(A.value) in DEFINE A: the current row DOES feed A's aggregate
    assert(run(Seq((1, 4), (2, 6), (3, 0), (4, 5)).toDF("id", "value"),
      """ORDER BY id
        |MEASURES RUNNING avg(A.value) AS running_avg_A, CLASSIFIER() AS classy
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)*)
        |DEFINE A AS avg(A.value) = 5""".stripMargin,
      Seq("id", "classy", "running_avg_A")) == expect(
      "1|B|ø", "2|B|ø", "3|B|ø", "4|A|5.0"))
  }

  test("selective aggregation over SUBSET rows (TestAggregationsInRowPatternMatching.java:678)") {
    val spk = spark; import spk.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value")
    assert(run(df,
      """ORDER BY id
        |MEASURES array_agg(U.id) AS measure_1, array_agg(CLASSIFIER(U)) AS measure_2
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (X Y Z Y)
        |SUBSET U = (X, Z)
        |DEFINE X AS true""".stripMargin,
      Seq("id", "measure_1", "measure_2")) == expect(
      "1|[1]|[X]", "2|[1]|[X]", "3|[1, 3]|[X, Z]", "4|[1, 3]|[X, Z]"))
  }

  test("count forms incl. RUNNING/FINAL and label-vs-column (TestAggregationsInRowPatternMatching.java:712,800)") {
    val spk = spark; import spk.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value")
    assert(run(df,
      """ORDER BY id
        |MEASURES count(*) AS measure_1, count() AS measure_2
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (X Y Z)
        |DEFINE X AS id > 1""".stripMargin,
      Seq("id", "measure_1", "measure_2")) == expect(
      "2|1|1", "3|2|2", "4|3|3"))
    assert(run(df,
      """ORDER BY id
        |MEASURES RUNNING count(*) AS m1, FINAL count(*) AS m2,
        |         RUNNING count() AS m3, FINAL count() AS m4
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B C D)
        |DEFINE A AS true""".stripMargin,
      Seq("id", "m1", "m2", "m3", "m4")) == expect(
      "1|1|4|1|4", "2|2|4|2|4", "3|3|4|3|4", "4|4|4|4|4"))
    assert(run(df,
      """ORDER BY id
        |MEASURES count(C.*) AS measure_1, count(U.*) AS measure_2
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B C D)
        |SUBSET U = (B, D)
        |DEFINE A AS true""".stripMargin,
      Seq("id", "measure_1", "measure_2")) == expect(
      "1|0|0", "2|0|1", "3|1|1", "4|1|2"))
    // column `A` and label `A`: count(A.A) = non-null A values on
    // A-rows; count(A) = non-null column values on all rows;
    // count(A.*) = A-labeled rows
    val dfA = Seq((1, Some("p")), (2, Some("q")), (3, None), (4, Some("s")))
      .toDF("id", "A")
    assert(run(dfA,
      """ORDER BY id
        |MEASURES CLASSIFIER() AS classy, count(A.A) AS m1, count(A) AS m2,
        |         count(A.*) AS m3
        |ALL ROWS PER MATCH
        |PATTERN (A B A A)
        |DEFINE A AS true""".stripMargin,
      Seq("id", "classy", "m1", "m2", "m3")) == expect(
      "1|A|1|1|1", "2|B|1|2|1", "3|A|1|2|2", "4|A|2|3|3"))
  }

  test("array measures feed excluded rows (TestAggregationsInRowPatternMatching.java:919)") {
    val spk = spark; import spk.implicits._
    val df = Seq(
      ("p1", 1, "1a"), ("p1", 2, "1b"), ("p1", 3, "1c"), ("p1", 4, "1d"), ("p1", 5, "1e"),
      ("p2", 1, "2a"), ("p2", 2, "2b"), ("p2", 3, "2c"), ("p2", 4, "2d"), ("p2", 5, "2e"))
      .toDF("part", "id", "value")
    assert(run(df,
      """PARTITION BY part
        |ORDER BY id
        |MEASURES array_agg(value) AS measure_1
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (P {- Q R -} S)
        |DEFINE P AS id > 1""".stripMargin,
      Seq("part", "measure_1")) == expect(
      "p1|[1b]", "p1|[1b, 1c, 1d, 1e]",
      "p2|[2b]", "p2|[2b, 2c, 2d, 2e]"))
  }

  test("balancing sums in DEFINE (TestAggregationsInRowPatternMatching.java:957)") {
    val spk = spark; import spk.implicits._
    val df = Seq((1, 4), (2, 6), (3, 10), (4, 1), (5, 1), (6, 1), (7, 10), (8, 5), (9, 1))
      .toDF("id", "value")
    assert(run(df,
      """ORDER BY id
        |MEASURES RUNNING sum(A.value) AS running_sum_A,
        |         RUNNING sum(B.value) AS running_sum_B,
        |         CLASSIFIER() AS classy
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)*)
        |DEFINE A AS sum(A.value) - A.value <= sum(B.value)""".stripMargin,
      Seq("id", "classy", "running_sum_A", "running_sum_B")) == expect(
      "1|B|ø|4", "2|A|6|4", "3|B|6|14", "4|A|7|14", "5|A|8|14",
      "6|A|9|14", "7|A|19|14", "8|B|19|19", "9|A|20|19"))
  }

  test("period length via COALESCE over DEFINE sums (TestAggregationsInRowPatternMatching.java:999)") {
    val spk = spark; import spk.implicits._
    val df = Seq((1, 3), (1, 4), (1, 5), (1, 8), (1, 9), (2, 2), (2, 3), (2, 4))
      .toDF("user_id", "minute_of_the_day")
    assert(run(df,
      """PARTITION BY user_id
        |ORDER BY minute_of_the_day
        |MEASURES COALESCE(sum(C.minute_of_the_day) - sum(A.minute_of_the_day), 0) AS periods_total
        |ONE ROW PER MATCH
        |PATTERN ((A B* C | D)*)
        |DEFINE B AS minute_of_the_day = PREV(minute_of_the_day) + 1,
        |       C AS minute_of_the_day = PREV(minute_of_the_day) + 1""".stripMargin,
      Seq("user_id", "CAST(periods_total AS INT)")) == expect("1|3", "2|2"))
  }

  test("set partitioning into equal sums (TestAggregationsInRowPatternMatching.java:1032)") {
    val spk = spark; import spk.implicits._
    assert(run((1 to 8).toDF("id"),
      """ORDER BY id
        |MEASURES RUNNING array_agg(CLASSIFIER()) AS running_labels
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (^(A | B)* (LAST_A | LAST_B)$)
        |DEFINE LAST_A AS sum(A.id) + id = sum(B.id),
        |       LAST_B AS sum(B.id) + id = sum(A.id)""".stripMargin,
      Seq("id", "running_labels")) == expect(
      "1|[A]", "2|[A, A]", "3|[A, A, A]", "4|[A, A, A, A]",
      "5|[A, A, A, A, B]", "6|[A, A, A, A, B, B]",
      "7|[A, A, A, A, B, B, B]", "8|[A, A, A, A, B, B, B, LAST_A]"))
    assert(run((1 to 6).toDF("id"),
      """ORDER BY id
        |MEASURES RUNNING array_agg(CLASSIFIER()) AS running_labels
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (^(A | B | C)* (LAST_A | LAST_B | LAST_C)$)
        |DEFINE LAST_A AS sum(A.id) + id = sum(B.id) AND sum(B.id) = sum(C.id),
        |       LAST_B AS sum(B.id) + id = sum(A.id) AND sum(A.id) = sum(C.id),
        |       LAST_C AS sum(C.id) + id = sum(A.id) AND sum(A.id) = sum(B.id)""".stripMargin,
      Seq("id", "running_labels")) == expect(
      "1|[A]", "2|[A, B]", "3|[A, B, C]", "4|[A, B, C, C]",
      "5|[A, B, C, C, B]", "6|[A, B, C, C, B, LAST_A]"))
  }

  // ============ TestCopyAggregationStateInRowPatternMatching.java =====
  // PATTERN ((A | B)* X) forks an NFA thread at every alternation; the
  // aggregation state must be per-thread (the reference copies state at
  // each fork; here each thread folds its own label history), and every
  // thread is validated at the final step by X's defining condition.

  /** The corpus' shared query shape over (VALUES (1),(2),(3)) t(id). */
  private def forked(define: String): Seq[String] = {
    val spk = spark; import spk.implicits._
    run((1 to 3).toDF("id"),
      s"""ORDER BY id
         |MEASURES CLASSIFIER() AS classy
         |ALL ROWS PER MATCH
         |PATTERN ((A | B)* X)
         |DEFINE X AS $define""".stripMargin,
      Seq("id", "classy"))
  }

  test("aggregation-state forking at alternations (TestCopyAggregationStateInRowPatternMatching.java:27)") {
    // testArrayAgg — SingleArrayAggregationState.copy()
    assert(forked("array_join(array_agg(CLASSIFIER()), '', '') = 'BAX'") ==
      expect("1|B", "2|A", "3|X"))
    // testMinByN / testMaxByN — MinMaxByNStateFactory.SingleMinMaxByNState.copy()
    assert(forked("array_join(min_by(CLASSIFIER(), id, 3), '', '') = 'BAX'") ==
      expect("1|B", "2|A", "3|X"))
    assert(forked("array_join(max_by(CLASSIFIER(), id, 3), '', '') = 'XAB'") ==
      expect("1|B", "2|A", "3|X"))
    // testMinN / testMaxN — MinMaxNStateFactory.SingleMinMaxNState.copy()
    assert(forked("array_join(min(CLASSIFIER(), 3), '', '') = 'ABX'") ==
      expect("1|A", "2|B", "3|X"))
    assert(forked("array_join(max(CLASSIFIER(), 3), '', '') = 'XBA'") ==
      expect("1|A", "2|B", "3|X"))
    // testMultimapAgg — SingleMultimapAggregationState.copy()
    assert(forked("array_join(element_at(multimap_agg(id, CLASSIFIER()), 1), '', '') = 'B'") ==
      expect("1|B", "2|A", "3|X"))
    // testMapAgg — KeyValuePairsStateFactory.SingleState.copy()
    assert(forked("element_at(map_agg(id, CLASSIFIER()), 1) = 'B'") ==
      expect("1|B", "2|A", "3|X"))
  }

  test("map_union state forking (TestCopyAggregationStateInRowPatternMatching.java:146)") {
    val spk = spark; import spk.implicits._
    assert(run(Seq("B", "C", "D").toDF("id"),
      """ORDER BY id
        |MEASURES CLASSIFIER() AS classy
        |ALL ROWS PER MATCH
        |PATTERN ((A | B)* X)
        |DEFINE X AS element_at(map_union(MAP(ARRAY[id], ARRAY[id])), 'B') = FIRST(CLASSIFIER())""".stripMargin,
      Seq("id", "classy")) == expect("B|B", "C|A", "D|X"))
  }

  // ============ TestExpressionRewriteInRowPatternMatching.java ========
  // Expression-rewrite interactions inside MEASURES and DEFINE: array
  // constructors (top-level and in aggregation arguments), LIKE
  // predicates, and division-by-zero shapes that the reference's
  // optimizer folds away (here: lazy IF + IEEE double division).

  test("array constructors in measures and DEFINE (TestExpressionRewriteInRowPatternMatching.java:38)") {
    val spk = spark; import spk.implicits._
    assert(run((1 to 3).toDF("id"),
      """ORDER BY id
        |MEASURES CLASSIFIER() AS classy,
        |         ARRAY['foo', CLASSIFIER()] AS arr,
        |         sum(array_max(ARRAY[MATCH_NUMBER()])) AS s
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)* X)
        |DEFINE X AS array_agg(CLASSIFIER()) = ARRAY['B', 'A', 'X'] AND
        |            sum(array_max(ARRAY[MATCH_NUMBER()])) = 3""".stripMargin,
      Seq("id", "classy", "arr", "s")) == expect(
      "1|B|[foo, B]|1", "2|A|[foo, A]|2", "3|X|[foo, X]|3"))
  }

  test("LIKE in measures and DEFINE (TestExpressionRewriteInRowPatternMatching.java:61)") {
    val spk = spark; import spk.implicits._
    assert(run((1 to 3).toDF("id"),
      """ORDER BY id
        |MEASURES CLASSIFIER() AS classy,
        |         CLASSIFIER() LIKE '%X' AS measure_1,
        |         bool_or(CLASSIFIER() LIKE '%B') AS measure_2
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)* X)
        |DEFINE X AS PREV(CLASSIFIER()) LIKE '%B' AND
        |            bool_or(CLASSIFIER() LIKE '%A')""".stripMargin,
      Seq("id", "classy", "measure_1", "measure_2")) == expect(
      "1|A|false|false", "2|B|false|true", "3|X|true|true"))
  }

  test("division-by-zero shapes fold away (TestExpressionRewriteInRowPatternMatching.java:84)") {
    val spk = spark; import spk.implicits._
    assert(run((1 to 3).toDF("id"),
      """ORDER BY id
        |MEASURES CLASSIFIER() AS classy,
        |         true OR MATCH_NUMBER() / 0 > 0 AS measure_1,
        |         bool_and(MATCH_NUMBER() / 0 > 0 AND false) AS measure_2
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((A | B)* X)
        |DEFINE X AS IF(false, 0 / 0, MATCH_NUMBER()) = 1 OR
        |             bool_and(MATCH_NUMBER() / 0 > 0 AND false)""".stripMargin,
      Seq("id", "classy", "measure_1", "measure_2")) == expect(
      "1|A|true|false", "2|A|true|false", "3|X|true|false"))
  }

  test("decimal aggregate state forking (TestCopyAggregationStateInRowPatternMatching.java:173)") {
    // testDecimalAvg — LongDecimalWithOverflowAndLongState.copy()
    assert(forked("avg(CAST(B.id AS decimal(2, 1))) = 1e0") ==
      expect("1|B", "2|A", "3|X"))
    assert(forked("avg(CAST(B.id AS decimal(30, 20))) = 1e0") ==
      expect("1|B", "2|A", "3|X"))
    // testDecimalSum — LongDecimalWithOverflowState.copy()
    assert(forked("sum(CAST(B.id AS decimal(2, 1))) = 1.0") ==
      expect("1|B", "2|A", "3|X"))
    assert(forked("sum(CAST(B.id AS decimal(30, 20))) = 1.0") ==
      expect("1|B", "2|A", "3|X"))
  }

  test("DEFINE-sum cost is linear in match length (incremental per-thread state)") {
    // The reference amortizes running DEFINE aggregates with per-thread
    // accumulators copied at NFA forks (operator/window/matcher); this
    // engine memoizes prefix states on the shared label-list nodes.
    // AggFeedCount counts cache-MISS row feeds: over an n-row single
    // match with `sum` in DEFINE it must grow O(n), not O(n²) — the
    // r18 re-fold performed ~n²/2 feeds (2000 rows → ~2M).
    val spk = spark; import spk.implicits._
    def feeds(n: Int): Long = {
      val df = (1 to n).map(i => (1L, i.toLong, 1L)).toDF("k", "ord", "value")
      val before = graft.operators.MatchRecognize.AggFeedCount.get()
      val out = graft.sqlcompat.MatchRecognizeSql.translate(
        """SELECT * FROM t MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY ord
            MEASURES count(*) AS cnt
            PATTERN (A+)
            DEFINE A AS sum(A.value) >= 0
          )""", _ => df).collect()
      assert(out.length == 1 && out.head.getAs[Long]("cnt") == n.toLong, s"n=$n: ${out.toSeq}")
      graft.operators.MatchRecognize.AggFeedCount.get() - before
    }
    val f1 = feeds(2000)
    val f2 = feeds(4000)
    assert(f1 <= 8L * 2000, s"feeds(2000)=$f1 — DEFINE sum re-folding the match prefix?")
    assert(f2 <= 8L * 4000, s"feeds(4000)=$f2")
    // doubling the match length must not quadruple the work
    assert(f2 <= 3L * f1, s"super-linear: feeds(2000)=$f1, feeds(4000)=$f2")
  }
}
