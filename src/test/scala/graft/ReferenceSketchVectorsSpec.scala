package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference engine's sketch-function vector suites, replayed
  * through `Dialect.translate`:
  *
  *  - `core/trino-main/src/test/java/io/trino/sql/query/
  *    TestSetDigestFunctions.java` — make_set_digest over
  *    bigint/varchar/date, cardinality, intersection_cardinality,
  *    jaccard_index (all exact in the sketch's <k regime, so the
  *    reference's literal expectations transfer). hash_counts is
  *    excluded: it asserts the reference's private hash values, an
  *    implementation detail no independent sketch can reproduce.
  *  - `TestTDigestFunctions.java` — value_at_quantile /
  *    values_at_quantiles in the discrete regime, unsorted-percentile
  *    error, empty-input NULL, serialization round-trip through
  *    varbinary, and the weighted-aggregation accuracy cross-check of
  *    tdigest vs qdigest at extreme percentiles.
  */
class ReferenceSketchVectorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var vectorCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-sketch-vectors", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"replayed $vectorCount reference sketch vectors")
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

  // ============================================= TestSetDigestFunctions

  test("set digest cardinality over bigint/varchar/date (TestSetDigestFunctions.java:41)") {
    v("SELECT cardinality(make_set_digest(value)) " +
      "FROM (VALUES 1, 2, 2, 3, 3, 3, 4, 4, 4, 4, 5) T(value)",
      "VALUES CAST(5 AS BIGINT)")
    v("SELECT cardinality(make_set_digest(value)) " +
      "FROM (VALUES 'trino', 'sql', 'everything', 'sql', 'trino') T(value)",
      "VALUES CAST(3 AS BIGINT)")
    v("SELECT cardinality(make_set_digest(value)) " +
      "FROM (VALUES DATE '2001-08-22', DATE '2001-08-22', DATE '2001-08-23') T(value)",
      "VALUES CAST(2 AS BIGINT)")
  }

  test("set digest intersection and jaccard (TestSetDigestFunctions.java:69)") {
    v("SELECT intersection_cardinality(make_set_digest(v1), make_set_digest(v2)) " +
      "FROM (VALUES (1, 1), (NULL, 2), (2, 3), (3, 4)) T(v1, v2)",
      "VALUES CAST(3 AS BIGINT)")
    v("SELECT jaccard_index(make_set_digest(v1), make_set_digest(v2)) " +
      "FROM (VALUES (1, 1), (NULL,2), (2, 3), (NULL, 4)) T(v1, v2)",
      "VALUES CAST(0.5 AS DOUBLE)")
  }

  // =============================================== TestTDigestFunctions

  test("value_at_quantile discrete regime (TestTDigestFunctions.java:40)") {
    v("SELECT value_at_quantile(tdigest_agg(d), 0.75e0) " +
      "FROM (VALUES 0.1e0, 0.2e0, 0.3e0, 0.4e0) T(d)", "VALUES 0.4e0")
    v("SELECT value_at_quantile(tdigest_agg(d), 0.75e0) " +
      "FROM (VALUES -0.1e0, -0.2e0, -0.3e0, -0.4e0) T(d)", "VALUES -0.1e0")
    v("SELECT value_at_quantile(tdigest_agg(d), 0.9e0) " +
      "FROM (VALUES 0.1e0, 0.1e0, 0.1e0, 0.1e0, 10e0) T(d)", "VALUES 10e0")
  }

  test("values_at_quantiles (TestTDigestFunctions.java:58)") {
    v("SELECT values_at_quantiles(tdigest_agg(d), ARRAY[0.0001e0, 0.75e0, 0.85e0]) " +
      "FROM (VALUES 0.1e0, 0.2e0, 0.3e0, 0.4e0) T(d)",
      "VALUES ARRAY[0.1e0, 0.4e0, 0.4e0]")
    v("SELECT values_at_quantiles(tdigest_agg(d), ARRAY[0.0001e0, 0.75e0, 0.85e0]) " +
      "FROM (VALUES -0.1e0, -0.2e0, -0.3e0, -0.4e0) T(d)",
      "VALUES ARRAY[-0.4e0, -0.1e0, -0.10]")
    v("SELECT values_at_quantiles(tdigest_agg(d), ARRAY[0.0001e0, 0.75e0, 0.85e0]) " +
      "FROM (VALUES 0.1e0, 0.1e0, 0.1e0, 0.1e0, 10e0) T(d)",
      "VALUES ARRAY[0.1e0, 0.1e0, 10.0e0]")
    vectorCount += 1
    val e = intercept[Throwable] {
      runQ("SELECT values_at_quantiles(tdigest_agg(d), ARRAY[1e0, 0e0]) " +
        "FROM (VALUES 0.1e0) T(d)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("percentiles must be sorted in increasing order")))
    v("SELECT values_at_quantiles(tdigest_agg(d), ARRAY[]) " +
      "FROM (VALUES 0.1e0, 0.2e0, 0.3e0, 0.4e0) T(d)",
      "VALUES CAST(ARRAY[] AS array(double))")
  }

  test("empty input yields NULL sketches (TestTDigestFunctions.java:90)") {
    v("SELECT tdigest_agg(d) FROM (SELECT 1e0 WHERE false) T(d)",
      "VALUES CAST(null AS tdigest)")
    v("SELECT values_at_quantiles(qdigest_agg(d), ARRAY[0.5e0]) " +
      "FROM (SELECT 1e0 WHERE false) T(d)",
      "VALUES CAST(null AS array(double))")
  }

  test("serialization round-trip through varbinary (TestTDigestFunctions.java:147)") {
    v("SELECT values_at_quantiles(CAST(CAST(tdigest_agg(d) AS varbinary) AS tdigest), " +
      "ARRAY[0, 1]) FROM (VALUES 1, 2, 3) T(d)",
      "VALUES CAST(ARRAY[1, 3] AS array(double))")
  }

  test("weighted tdigest vs qdigest at extreme percentiles (TestTDigestFunctions.java:103)") {
    // the reference builds 2000 (value, weight) pairs from seeded
    // java.util.Random; a deterministic LCG here serves the same
    // purpose (values in [0,1000), weights in [1,10))
    var seed = 1L
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, bound.toLong)
    }
    val pairs = (1L, 1L) +: (1 until 2000).map(_ => (next(1000), 1 + next(9)))
    val valuesSql = pairs.map { case (n, w) => s"($n, $w)" }.mkString(", ")
    val percentiles = "ARRAY[0.00001, 0.0001, 0.001, 0.01, 0.99, 0.999, 0.9999, 0.99999]"
    val t = runQ(s"SELECT values_at_quantiles(tdigest_agg(n, w), $percentiles) " +
      s"FROM (VALUES $valuesSql) T(n, w)").collect()(0).getSeq[Double](0)
    val q = runQ(s"SELECT values_at_quantiles(qdigest_agg(n, w, 0.00001), $percentiles) " +
      s"FROM (VALUES $valuesSql) T(n, w)").collect()(0).getSeq[Double](0)
    vectorCount += 1
    t.zip(q).zipWithIndex.foreach { case ((tv, qv), i) =>
      assert(math.abs(math.rint(tv) - qv) <= 1.0,
        s"percentile index $i: tdigest $tv vs qdigest $qv")
    }
  }

  test("invalid weights fail loud (QuantileDigestFunctions/TDigestFunctions.verifyWeight)") {
    // reference: qdigest weight must be > 0, tdigest weight >= 1 —
    // a zero/negative weight would silently corrupt the sketch
    def err(sql: String, frag: String): Unit = {
      vectorCount += 1
      val e = intercept[Throwable] { runQ(sql).collect() }
      def msgs(th: Throwable): Seq[String] =
        if (th == null) Seq.empty
        else Option(th.getMessage).toSeq ++ msgs(th.getCause)
      assert(msgs(e).exists(_.contains(frag)), s"wrong error for: $sql\ngot: $e")
    }
    err("SELECT qdigest_agg(n, w) FROM (VALUES (1, 0), (2, 3)) T(n, w)",
      "percentile weight must be > 0")
    err("SELECT qdigest_agg(n, w) FROM (VALUES (1, -2)) T(n, w)",
      "percentile weight must be > 0")
    err("SELECT tdigest_agg(n, w) FROM (VALUES (1e0, 0e0)) T(n, w)",
      "weight must be >= 1")
    // boundary weights stay valid
    v("SELECT values_at_quantiles(qdigest_agg(n, w), ARRAY[1e0]) " +
      "FROM (VALUES (1, 1), (7, 2)) T(n, w)",
      "VALUES CAST(ARRAY[7] AS array(bigint))")
  }

  test("make_set_digest over doubles keeps distinct fractional values distinct") {
    // longValue() truncation would collide 1.1/1.9 and 2.1/2.9 —
    // IEEE-754 bit hashing keeps all four apart
    v("SELECT cardinality(make_set_digest(d)) " +
      "FROM (VALUES 1.1e0, 1.9e0, 2.1e0, 2.9e0) T(d)",
      "VALUES BIGINT '4'")
  }
}
