package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke over the whole SparkEntry surface at sf0.001 (the
  * driver's t1 scale): every declared query must plan and execute, the
  * flagship returns rows, and key physical-plan properties hold
  * (filter pushdown, WindowGroupLimit for top-N-per-group — the plan
  * checks SURVEY §5.4 calls for). */
class SmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("exact_quantiles matches the built-in percentile bit-for-bit") {
    // exact_quantiles replaces percentile() in the sketch-validation
    // queries for speed (buffer+sort vs hash-counting); it must keep
    // the identical interpolation contract, including across partials.
    import org.apache.spark.sql.functions.expr
    val li = graft.engine.Graft.load(spark, sfDir, "lineitem").repartition(7)
    val r = li.agg(
      expr("exact_quantiles(l_extendedprice, array(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0))").as("eq"),
      expr("percentile(l_extendedprice, array(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0))").as("p"))
      .head()
    assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    // empty input → null, like the built-in
    val e = li.filter("l_extendedprice < 0").agg(
      expr("exact_quantiles(l_extendedprice, array(0.5))").as("eq")).head()
    assert(e.isNullAt(0))
    // out-of-range fractions rejected up front, like the built-in
    // (q in (-1,0) would silently extrapolate; q <= -1 would index
    // negatively; q > 1 would silently clamp to the max)
    for (bad <- Seq("-0.5", "-2.0", "1.5")) {
      val ex = intercept[Exception] {
        li.limit(10).agg(
          expr(s"exact_quantiles(l_extendedprice, array($bad))")).head()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("must be in [0, 1]")))
    }
  }

  test("no gated query emits DecimalType at the oracle boundary") {
    // The driver's hash gate compares stringified values and pyarrow
    // renders decimals scale-faithfully ('x.00') while the DuckDB
    // oracle frame holds float64 ('x.0') — so ANY decimal-typed output
    // column is a latent hash mismatch (round-9 dc1/dc3). Decimal
    // arithmetic is fine internally; the output boundary must be
    // decimal-free. Schema-only: builds every plan, runs nothing.
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val decCols = fn(spark, sfDir).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name)
      if (decCols.isEmpty) Nil else Seq(s"$name: ${decCols.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"decimal-typed output columns at the gate boundary:\n${offenders.mkString("\n")}")
  }

  test("map_union and multimap_agg aggregate across partitions") {
    import org.apache.spark.sql.functions._
    val spk = spark
    import spk.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L), ("a", 5L))
      .toDF("k", "v").repartition(7)
    val r = df.withColumn("m", map(col("k"), lit(1L)))
      .agg(expr("map_union(m)").as("u"), expr("multimap_agg(k, v)").as("mm"))
      .selectExpr(
        "array_sort(map_keys(u)) AS uk",
        "array_sort(mm['a']) AS va",
        "array_sort(mm['c']) AS vc")
      .head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getSeq[Long](1) == Seq(1L, 3L, 5L))
    assert(r.getSeq[Long](2) == Seq(4L))
  }

  test("map aggregates use SQL key equality for floating-point keys") {
    import org.apache.spark.sql.functions._
    val spk = spark
    import spk.implicits._
    // -0.0 and 0.0 are one SQL map key; JVM boxed equals would split them.
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("k", "v").repartition(3)
    val r = df.withColumn("m", map(col("k"), col("v")))
      .agg(expr("multimap_agg(k, v)").as("mm"), expr("map_union(m)").as("u"))
      .selectExpr("cardinality(mm) AS nmm", "cardinality(u) AS nu",
        "array_sort(mm[0.0d]) AS zeros")
      .head()
    assert(r.getInt(0) == 2, s"multimap keys=${r.getInt(0)}")
    assert(r.getInt(1) == 2, s"map_union keys=${r.getInt(1)}")
    assert(r.getSeq[Long](2) == Seq(1L, 2L))
  }

  test("map aggregates canonicalize NESTED keys (struct/array, float fields)") {
    import org.apache.spark.sql.functions._
    val spk = spark
    import spk.implicits._
    // Struct keys mixing -0.0/0.0 and NaN variants in a nested field,
    // built via named_struct (GenericInternalRow) — byte-pattern or
    // row-representation equality would split all of these.
    val df = Seq((0.0, "x", 1L), (-0.0, "x", 2L),
        (Double.NaN, "y", 3L), (Double.NaN, "y", 4L), (1.5, "x", 5L))
      .toDF("d", "s", "v").repartition(5)
    val r = df
      .withColumn("k", expr("named_struct('d', d, 's', s)"))
      .withColumn("ka", expr("array(d, 0.25d)"))
      .agg(expr("multimap_agg(k, v)").as("mk"), expr("multimap_agg(ka, v)").as("ma"))
      .selectExpr(
        "cardinality(mk) AS nk", "cardinality(ma) AS na",
        "array_sort(mk[named_struct('d', 0.0d, 's', 'x')]) AS zeros",
        "array_sort(ma[array(cast('NaN' AS DOUBLE), 0.25d)]) AS nans")
      .head()
    assert(r.getInt(0) == 3, s"struct keys=${r.getInt(0)}")
    assert(r.getInt(1) == 3, s"array keys=${r.getInt(1)}")
    assert(r.getSeq[Long](2) == Seq(1L, 2L))
    assert(r.getSeq[Long](3) == Seq(3L, 4L))
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("top-N-per-group plans as WindowGroupLimit") {
    val plan = graft.queries.Windows.w8(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("SQL-text FETCH WITH TIES plans as WindowGroupLimit") {
    val plan = graft.queries.DialectQueries.dx11(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("q6 pushes filters into the parquet scan") {
    val plan = graft.queries.Relational.q6(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"), plan.take(2000))
  }

  test("tablesample stays within binomial bounds") {
    val n = graft.queries.SetOps.smp1(spark, sfDir).count()
    val total = graft.engine.Graft.load(spark, sfDir, "orders").count()
    val expected = total * 0.2
    val sigma = math.sqrt(total * 0.2 * 0.8)
    assert(math.abs(n - expected) <= 6 * sigma, s"sampled $n of $total")
  }

  test("registered SQL functions evaluate") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val row = spark.sql(
      """SELECT cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |  simhash64('hello world') AS sh,
        |  word_stem('stories') AS st,
        |  lang_id('the cat and the dog in the house') AS lang,
        |  luhn_check('79927398713') AS luhn,
        |  wilson_interval_lower(10, 20, 1.96) AS wl
        |""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getString(2) == "stori") // full Porter: stories -> stori
    assert(row.getString(3) == "en")
    assert(row.getBoolean(4))
    assert(row.getDouble(5) > 0.27 && row.getDouble(5) < 0.5)
  }

  test("compat pack: scalar spellings evaluate with reference semantics") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT strpos('graft engine', 'eng') AS sp,
        |  codepoint('A') AS cp,
        |  day_of_week(DATE'2026-08-13') AS dw,
        |  day_of_year(DATE'2026-02-01') AS dy,
        |  week(DATE'2026-01-08') AS wk,
        |  year_of_week(DATE'2021-01-01') AS yw,
        |  millisecond(TIMESTAMP'2026-08-13 01:02:03.456') AS ms,
        |  to_unixtime(TIMESTAMP'1970-01-01 00:00:10') AS ut,
        |  is_nan(nan()) AS nn,
        |  bitwise_left_shift(1, 4) AS bl,
        |  bitwise_right_shift(-8L, 1) AS br,
        |  bitwise_right_shift_arithmetic(-8L, 1) AS ba,
        |  combine_hash(2L, 5L) AS ch,
        |  hex(from_hex('4a')) AS fh,
        |  truncate(-3.7d) AS tr,
        |  element_at(split_to_map('a=1,b=2', ',', '='), 'b') AS sm,
        |  trim_array(array(1, 2, 3, 4), 2) AS ta,
        |  json_extract('{"a":{"b":[1,2]}}', '$.a.b') AS je,
        |  json_extract_scalar('{"a":"x"}', '$.a') AS js,
        |  is_json_scalar('3') AS ijs,
        |  json_array_contains('[1,2,3]', '2') AS jac,
        |  json_array_get('["a","b","c"]', -1) AS jag
        |""".stripMargin).head()
    assert(r.getLong(0) == 7L)            // strpos is 1-based
    assert(r.getInt(1) == 65)
    assert(r.getLong(2) == 4L)            // 2026-08-13 is a Thursday, ISO dow
    assert(r.getLong(3) == 32L)
    assert(r.getLong(4) == 2L)
    assert(r.getLong(5) == 2020L)         // 2021-01-01 sits in ISO week 53/2020
    assert(r.getLong(6) == 456L)
    assert(r.getDouble(7) == 10.0)
    assert(r.getBoolean(8))
    assert(r.getInt(9) == 16)
    assert(r.getLong(10) == 9223372036854775804L) // logical shift of -8
    assert(r.getLong(11) == -4L)                  // arithmetic shift of -8
    assert(r.getLong(12) == 67L)                  // 31*2+5
    assert(r.getString(13) == "4A")
    assert(r.getDouble(14) == -3.0)               // truncate toward zero
    assert(r.getString(15) == "2")
    assert(r.getSeq[Int](16) == Seq(1, 2))
    assert(r.getString(17) == "[1,2]")
    assert(r.getString(18) == "x")
    assert(r.getBoolean(19))
    assert(r.getBoolean(20))
    assert(r.getString(21) == "c")
  }

  test("compat pack: binary codecs round-trip and tstz offsets extract") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT from_big_endian_64(to_big_endian_64(-42L)) AS b64,
        |  from_big_endian_32(to_big_endian_32(7)) AS b32,
        |  from_ieee754_64(to_ieee754_64(2.5d)) AS d64,
        |  from_ieee754_32(to_ieee754_32(CAST(1.5 AS FLOAT))) AS f32,
        |  hex(to_big_endian_64(1L)) AS hb,
        |  from_base64url(to_base64url(X'01FF')) AS bu,
        |  timezone_hour(named_struct(
        |    'instant', to_utc_timestamp(TIMESTAMP'2026-01-15 00:00:00', 'Asia/Kolkata'),
        |    'zone', 'Asia/Kolkata')) AS th,
        |  timezone_minute(named_struct(
        |    'instant', to_utc_timestamp(TIMESTAMP'2026-01-15 00:00:00', 'Asia/Kolkata'),
        |    'zone', 'Asia/Kolkata')) AS tm
        |""".stripMargin).head()
    assert(r.getLong(0) == -42L)
    assert(r.getInt(1) == 7)
    assert(r.getDouble(2) == 2.5)
    assert(r.getFloat(3) == 1.5f)
    assert(r.getString(4) == "0000000000000001")
    assert(r.getAs[Array[Byte]](5).toSeq == Seq[Byte](1, -1))
    assert(r.getLong(6) == 5L)  // +05:30 → hour 5
    assert(r.getLong(7) == 30L) // +05:30 → minute 30
  }

  test("compat pack: aggregate spellings; checksum is order-independent") {
    graft.engine.Graft.registerAll(spark, sfDir)
    import org.apache.spark.sql.functions.expr
    val df = spark.range(1, 5).selectExpr("id", "id % 2 AS k")
    val r = df.agg(
      expr("approx_distinct(id) AS ad"),
      expr("arbitrary(id) AS ar"),
      expr("bitwise_and_agg(id) AS ba"),
      expr("bitwise_or_agg(id) AS bo"),
      expr("geometric_mean(id) AS gm"),
      expr("histogram(k) AS h")).head()
    assert(r.getLong(0) == 4L) // HLL++ is exact at tiny cardinality
    assert(r.getLong(1) >= 1L && r.getLong(1) <= 4L)
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == 7L)
    assert(math.abs(r.getDouble(4) - math.pow(24.0, 0.25)) < 1e-9)
    assert(r.getMap[Long, Long](5) == Map(0L -> 2L, 1L -> 2L))
    val a = spark.sql("SELECT checksum(x) AS c FROM VALUES (1), (2), (3) t(x)")
      .head().getAs[Array[Byte]](0)
    val b = spark.sql("SELECT checksum(x) AS c FROM VALUES (3), (1), (2) t(x)")
      .head().getAs[Array[Byte]](0)
    val c = spark.sql("SELECT checksum(x) AS c FROM VALUES (1), (2) t(x)")
      .head().getAs[Array[Byte]](0)
    assert(a.toSeq == b.toSeq)       // permutation-invariant
    assert(a.toSeq != c.toSeq)       // sensitive to content
    val withNull = spark.sql(
      "SELECT checksum(x) AS c FROM VALUES (1), (CAST(NULL AS INT)) t(x)")
      .head().getAs[Array[Byte]](0)
    val without = spark.sql("SELECT checksum(x) AS c FROM VALUES (1) t(x)")
      .head().getAs[Array[Byte]](0)
    assert(withNull.toSeq != without.toSeq) // null rows count
    // two-level set digest: per-shard make_set_digest re-merged by
    // merge_set_digest equals the single-level digest, bit for bit
    val oneLevel = spark.range(0, 500).agg(expr("make_set_digest(id) AS d"))
      .head().getAs[Array[Byte]](0)
    val twoLevel = spark.range(0, 500).selectExpr("id % 4 AS shard", "id")
      .groupBy("shard").agg(expr("make_set_digest(id) AS d"))
      .agg(expr("merge_set_digest(d) AS d"))
      .head().getAs[Array[Byte]](0)
    assert(oneLevel.toSeq == twoLevel.toSeq)
    val hc = spark.range(0, 500).agg(expr("hash_counts(make_set_digest(id)) AS hc"))
      .head().getAs[Map[Long, Short]](0)
    assert(hc.nonEmpty && hc.values.forall(_ == 1))
  }

  test("compat pack r13: digests, lambda predicates, map_agg") {
    graft.engine.Graft.registerAll(spark, sfDir)
    // NIST FIPS 180-4 vectors for "abc"; murmur3 is the x64_128
    // public-domain vector (h1,h2 little-endian, seed 0 — airlift/
    // Guava layout)
    val r = spark.sql(
      "SELECT hex(sha256(encode('abc', 'UTF-8'))) AS s256, " +
        "hex(sha512(encode('abc', 'UTF-8'))) AS s512, " +
        "hex(murmur3(encode('abc', 'UTF-8'))) AS mm, " +
        "hex(murmur3(CAST('' AS BINARY))) AS mm_empty, " +
        "parse_presto_data_size('2.3MB') AS ds, " +
        "infinity() AS inf").head()
    assert(r.getString(0).toLowerCase ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getString(1).toLowerCase ==
      ("ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"))
    assert(r.getString(2).toLowerCase == "6778ad3f3f3f96b4522dca264174a23b")
    assert(r.getString(3) == "00000000000000000000000000000000")
    assert(r.getLong(4) == 2411724L) // 2.3*2^20 truncates (ref vectors)
    assert(r.getDouble(5).isPosInfinity)
    // three-valued logic parity for the match predicates
    val m = spark.sql(
      "SELECT all_match(a, x -> x > 0) AS am, any_match(a, x -> x > 2) AS anym, " +
        "none_match(a, x -> x > 2) AS nm, " +
        "all_match(array(1, CAST(NULL AS INT)), x -> x > 0) AS am_null, " +
        "any_match(array(1, CAST(NULL AS INT)), x -> x > 0) AS any_sc " +
        "FROM VALUES (array(1, 2, 3)) t(a)").head()
    assert(m.getBoolean(0) && m.getBoolean(1) && !m.getBoolean(2))
    assert(m.isNullAt(3))          // TRUE+NULL -> NULL under 3VL
    assert(m.getBoolean(4))        // one TRUE short-circuits the NULL
    // map_agg: first value wins per key, null keys dropped, null values kept
    val mm = spark.sql(
      "SELECT map_agg(k, v) AS m FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)), " +
        "(CAST(NULL AS INT), 'x') t(k, v)").head().getMap[Int, String](0)
    assert(mm == Map(1 -> "a", 2 -> null))
  }

  test("idempotent collection ops collapse via the injected optimizer rule") {
    graft.engine.Graft.registerAll(spark, sfDir)
    import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, SortArray}
    val plan = spark.sql(
      "SELECT array_distinct(array_distinct(split(text, ' '))) FROM documents")
      .queryExecution.optimizedPlan
    val nDistinct = plan.expressions.map(_.collect { case a: ArrayDistinct => a }.size).sum
    assert(nDistinct == 1, plan.toString.take(800))
    val plan2 = spark.sql(
      "SELECT sort_array(sort_array(split(text, ' '))) FROM documents")
      .queryExecution.optimizedPlan
    val nSort = plan2.expressions.map(_.collect { case s: SortArray => s }.size).sum
    assert(nSort == 1, plan2.toString.take(800))
  }

  test("every annotated reference function name resolves in the registry") {
    // The full @ScalarFunction/@AggregationFunction/@WindowFunction name
    // inventory extracted from the reference's core engine
    // (core/trino-main/src/main/java/io/trino/**, incl. multi-line
    // annotations and alias= lists), pinned as a test resource so a
    // registry regression is caught line-item. Known exclusions are the
    // declared non-goals (SURVEY §2): security/role introspection.
    val nonGoals = Set("current_groups") // roles surface — declared non-goal
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/reference_function_names.txt"))
    val names = try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally src.close()
    assert(names.size > 150, s"name inventory unexpectedly small: ${names.size}")
    val missing = names.filterNot(nonGoals).filterNot { n =>
      try {
        spark.sessionState.catalog.lookupFunctionInfo(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n))
        true
      } catch { case _: Throwable => false }
    }
    assert(missing.isEmpty, s"unresolved reference functions: ${missing.mkString(", ")}")
  }

  test("constant-index element_at collapses to the element (rule + codegen)") {
    graft.engine.Graft.registerAll(spark, sfDir)
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, ElementAt}
    // The collapse: no CreateArray/ElementAt survives a foldable in-bounds index.
    val q = "SELECT element_at(array(n_nationkey, n_regionkey, 99), 3) AS third, " +
      "element_at(array(n_nationkey, n_regionkey), -2) AS first FROM nation"
    val plan = spark.sql(q).queryExecution.optimizedPlan
    val survivors = plan.expressions.map(_.collect {
      case a: CreateArray => a; case e: ElementAt => e }.size).sum
    assert(survivors == 0, plan.toString.take(800))
    // Values: third is always the literal, first mirrors n_nationkey.
    val rows = spark.sql(q + " ORDER BY first LIMIT 3").collect()
    assert(rows.forall(_.getInt(0) == 99))
    // Codegen must hold with NO fallback — this exact shape (nullable
    // column + non-nullable selected element) used to trip Spark's
    // ElementAt doGenCode into referencing an undeclared isNull var.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(spark.sql(q).collect().length == spark.table("nation").count())
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    // Reference subscript contract: out-of-bounds element_at is NULL
    // (TestArrayOperators testElementAt), not Spark-ANSI's error —
    // CompatAliases registers the non-failing form.
    val oob = spark.sql(
      "SELECT element_at(array(n_nationkey), 5) FROM nation").collect()
    assert(oob.nonEmpty && oob.forall(_.isNullAt(0)))
  }

  test("parameterized statements (PREPARE/EXECUTE surface)") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) AS c FROM orders WHERE o_totalprice > :minPrice",
      Map("minPrice" -> 400000.0)).head().getLong(0)
    val expected = graft.engine.Graft.load(spark, sfDir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 400000.0).count()
    assert(n == expected && n > 0)
  }

  test("no declared query plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("uuid() generates unique values") {
    val df = spark.range(1000).selectExpr("uuid() AS u")
    assert(df.distinct().count() == 1000)
  }

  test("qdigest SQL median within bound on lineitem") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT value_at_quantile(qdigest_agg(l_extendedprice), 0.5) AS med,
        |  percentile(l_extendedprice, 0.5) AS exact
        |FROM lineitem""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= r.getDouble(1) * 0.011)
  }

  test("values_at_quantiles equals per-quantile value_at_quantile calls") {
    graft.engine.Graft.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT values_at_quantiles(sk, array(0.25d, 0.5d, 0.75d)) AS batch,
        |  array(value_at_quantile(sk, 0.25), value_at_quantile(sk, 0.5),
        |        value_at_quantile(sk, 0.75)) AS singles
        |FROM (SELECT qdigest_agg(l_extendedprice) AS sk FROM lineitem)""".stripMargin)
      .head()
    assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    // dispatch covers the bigint and tdigest families too
    val r2 = spark.sql(
      """SELECT values_at_quantiles(qdigest_agg(CAST(l_quantity AS BIGINT)),
        |    array(0.5d))[0] AS qb,
        |  value_at_quantile(qdigest_agg(CAST(l_quantity AS BIGINT)), 0.5) AS sb,
        |  values_at_quantiles(tdigest_agg(l_extendedprice), array(0.5d))[0] AS qt,
        |  value_at_quantile(tdigest_agg(l_extendedprice), 0.5) AS st
        |FROM lineitem""".stripMargin).head()
    assert(r2.getDouble(0) == r2.getDouble(1))
    assert(r2.getDouble(2) == r2.getDouble(3))
  }
}
