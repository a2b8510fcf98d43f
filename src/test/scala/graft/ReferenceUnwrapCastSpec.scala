package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference's cast-comparison consistency corpus
  * (`core/trino-main/src/test/java/io/trino/sql/query/
  * TestUnwrapCastInComparison.java`), replayed through
  * `Dialect.translate`. The property is SELF-CHECKING: for a value v
  * arriving through a column (so the optimizer's unwrap-cast rule can
  * fire) and a constant c,
  *
  *   (CAST(v AS T) op c) IS NOT DISTINCT FROM (constant-folded form)
  *
  * must hold for every comparison operator across type-boundary
  * values (MIN-1, MIN, 0, 1, MAX, MAX+1, float specials, NaN,
  * day-boundary timestamps). This pins that Spark's own
  * UnwrapCastInBinaryComparison plus the dialect layer never change a
  * comparison's result at the edges where such rewrites historically
  * break. Cases are batched per (fromType, toType, operator) into one
  * bool_and query each. */
class ReferenceUnwrapCastSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var caseCount = 0

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-unwrap-cast", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    info(s"validated $caseCount unwrap-cast cases")
    if (spark != null) spark.stop()
  }

  private val Ops = Seq("=", "<>", ">=", ">", "<=", "<", "IS DISTINCT FROM")

  /** One batch: every (from, to) pair under one (fromType, toType, op). */
  private def validate(fromType: String, froms: Seq[String],
      toType: String, tos: Seq[String], op: String): Unit = {
    val branches = for (f <- froms; t <- tos) yield
      s"SELECT ((CAST(v AS $toType) $op CAST($t AS $toType)) " +
        s"IS NOT DISTINCT FROM " +
        s"(CAST($f AS $toType) $op CAST($t AS $toType))) AS ok " +
        s"FROM (VALUES CAST($f AS $fromType)) t(v)"
    caseCount += branches.size
    val sql = s"SELECT bool_and(ok) FROM (${branches.mkString(" UNION ALL ")})"
    val r = spark.sql(graft.sqlcompat.Dialect.translate(sql)).head()
    assert(!r.isNullAt(0) && r.getBoolean(0),
      s"unwrap-cast divergence in batch $fromType -> $toType op '$op'")
  }

  private def nums(vs: Any*): Seq[String] =
    vs.map { case null => "NULL"; case v => v.toString }

  test("tinyint boundaries (TestUnwrapCastInComparison.java:57)") {
    val froms = nums(null, Byte.MinValue, 0, 1, Byte.MaxValue)
    val tos = nums(null, Byte.MinValue - 1, Byte.MinValue, 0, 1, Byte.MaxValue, Byte.MaxValue + 1)
    for (tt <- Seq("SMALLINT", "INTEGER", "BIGINT", "REAL", "DOUBLE"); op <- Ops)
      validate("TINYINT", froms, tt, tos, op)
  }

  test("smallint boundaries (TestUnwrapCastInComparison.java:86)") {
    val froms = nums(null, Short.MinValue, 0, 1, Short.MaxValue)
    val tos = nums(null, Short.MinValue - 1, Short.MinValue, 0, 1, Short.MaxValue, Short.MaxValue + 1)
    for (tt <- Seq("INTEGER", "BIGINT", "REAL", "DOUBLE"); op <- Ops)
      validate("SMALLINT", froms, tt, tos, op)
  }

  test("integer boundaries (TestUnwrapCastInComparison.java:111)") {
    val froms = nums(null, Int.MinValue, 0, 1, Int.MaxValue)
    for (op <- Ops) {
      validate("INTEGER", froms, "BIGINT",
        nums(null, Int.MinValue - 1L, Int.MinValue, 0, 1, Int.MaxValue, Int.MaxValue + 1L), op)
      validate("INTEGER", froms, "DOUBLE",
        nums(null, Int.MinValue - 1L, Int.MinValue, 0, 0.1, 0.9, 1, Int.MaxValue, Int.MaxValue + 1L), op)
      validate("INTEGER", froms, "REAL",
        nums(null, Int.MinValue - 1L, Int.MinValue, -(1L << 24), 0, 0.1, 0.9, 1,
          1L << 22, Int.MaxValue, Int.MaxValue + 1L), op)
    }
  }

  test("bigint boundaries incl. double precision loss (TestUnwrapCastInComparison.java:132)") {
    val froms = nums(null, Long.MinValue, 0, 1, Long.MaxValue)
    for (op <- Ops) {
      validate("BIGINT", froms, "DOUBLE",
        nums(null, Long.MinValue, Long.MinValue + 1, -(1L << 54), 0, 0.1, 0.9, 1,
          1L << 52, Long.MaxValue - 1, Long.MaxValue), op)
      validate("BIGINT", froms, "REAL",
        nums(null, Long.MinValue, Long.MinValue + 1, -(1L << 24), 0, 0.1, 0.9, 1,
          1L << 22, Long.MaxValue - 1, Long.MaxValue), op)
    }
  }

  test("real to double incl. specials (TestUnwrapCastInComparison.java:149)") {
    val froms = Seq("NULL", "CAST('-Infinity' AS REAL)", s"CAST('${-java.lang.Float.MAX_VALUE}' AS REAL)",
      "CAST(0 AS REAL)", "CAST(0.1 AS REAL)", "CAST(0.9 AS REAL)", "CAST(1 AS REAL)",
      s"CAST('${java.lang.Float.MAX_VALUE}' AS REAL)", "CAST('Infinity' AS REAL)", "CAST('NaN' AS REAL)")
    val tos = Seq("NULL", "CAST('-Infinity' AS DOUBLE)",
      s"CAST('${Math.nextDown(-java.lang.Float.MIN_VALUE.toDouble)}' AS DOUBLE)",
      s"CAST('${-java.lang.Float.MIN_VALUE.toDouble}' AS DOUBLE)",
      "CAST(0 AS DOUBLE)", "CAST(0.1 AS DOUBLE)", "CAST(0.9 AS DOUBLE)", "CAST(1 AS DOUBLE)",
      s"CAST('${java.lang.Float.MAX_VALUE.toDouble}' AS DOUBLE)",
      s"CAST('${Math.nextUp(java.lang.Float.MAX_VALUE.toDouble)}' AS DOUBLE)",
      "CAST('Infinity' AS DOUBLE)", "CAST('NaN' AS DOUBLE)")
    for (op <- Ops) validate("REAL", froms, "DOUBLE", tos, op)
  }

  test("decimal to floating point (TestUnwrapCastInComparison.java:164)") {
    for (op <- Ops) {
      validate("DECIMAL(15, 0)", Seq("-999999999999999", "999999999999999"),
        "DOUBLE", Seq("-999999999999999", "999999999999999"), op)
      validate("DECIMAL(16, 0)", Seq("-9999999999999999", "9999999999999999"),
        "DOUBLE", Seq("-9999999999999999", "9999999999999999"), op)
      validate("DECIMAL(7, 0)", Seq("-9999999", "9999999"),
        "REAL", Seq("-9999999", "9999999"), op)
      validate("DECIMAL(8, 0)", Seq("-99999999", "99999999"),
        "REAL", Seq("-99999999", "99999999"), op)
    }
  }

  test("varchar widening (TestUnwrapCastInComparison.java:208)") {
    val froms = Seq("NULL", "''", "'a'", "'b'")
    val tos = Seq("NULL", "''", "'a'", "'aa'", "'b'")
    for (op <- Ops) validate("VARCHAR(1)", froms, "VARCHAR(2)", tos, op)
  }

  test("timestamp to date at day boundaries (TestUnwrapCastInComparison.java:446)") {
    val froms = Seq("NULL") ++ Seq(
      "1981-06-21 23:59:59.999", "1981-06-22 00:00:00.000", "1981-06-22 00:00:00.001",
      "1981-06-22 23:59:59.999", "1981-06-23 00:00:00.000", "1981-06-23 00:00:00.001")
      .map(s => s"TIMESTAMP '$s'")
    val tos = Seq("NULL") ++ Seq("1981-06-21", "1981-06-22", "1981-06-23")
      .map(s => s"DATE '$s'")
    for (op <- Ops) {
      validate("TIMESTAMP", froms, "DATE", tos, op)
      // the date(v) function form
      val branches = for (f <- froms; t <- tos) yield
        s"SELECT ((date(v) $op CAST($t AS DATE)) IS NOT DISTINCT FROM " +
          s"(CAST($f AS DATE) $op CAST($t AS DATE))) AS ok " +
          s"FROM (VALUES CAST($f AS TIMESTAMP)) t(v)"
      caseCount += branches.size
      val sql = s"SELECT bool_and(ok) FROM (${branches.mkString(" UNION ALL ")})"
      val r = spark.sql(graft.sqlcompat.Dialect.translate(sql)).head()
      assert(!r.isNullAt(0) && r.getBoolean(0),
        s"date(v) divergence under op '$op'")
    }
  }
}
