package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft

/** Fixture queries exercising the function registry (graft.functions):
  * the native cosine_similarity expression, width_bucket, the qdigest
  * sketch aggregate under an error-bound oracle, the space-saving
  * heavy-hitters aggregate, and simhash64 banding.
  *
  * Oracle protocol notes: sketch internals are engine-specific, so
  * (exactly like the reference's approx-aggregate tests,
  * `ApproximateCountDistinctAggregation.java:47-48`) the oracle pins
  * error-bound PREDICATES (which both engines must satisfy) or exact
  * values the sketch provably reproduces at this cardinality, never
  * sketch bytes.
  */
object Functions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  // ------------------------------------------- f1 cosine expression
  /** The registered native cosine_similarity expression (SQL surface),
    * checked bit-exactly against the oracle's explicit fold formula —
    * proves the codegen'd kernel computes the documented left-fold. */
  def f1(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    q.join(e.filter(col("vec_id").between(5, 40)), col("vec_id") =!= col("qid"))
      .selectExpr("qid", "vec_id", "cosine_similarity(qe, embedding) AS cos")
  }

  val f1Sql: String =
    """SELECT q.vec_id AS qid, e.vec_id,
      |  list_sum(list_transform(generate_series(1, len(q.embedding)),
      |    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |       i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
      |       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
      |FROM embeddings q, embeddings e
      |WHERE q.vec_id < 5 AND e.vec_id BETWEEN 5 AND 40""".stripMargin

  // --------------------------------------------- f2 width_bucket
  /** width_bucket histogram of order values (reference MathFunctions
    * width_bucket); the oracle spells out the same clamped-floor
    * formula. Bucket edges are exact decimals so both formulations
    * produce identical doubles at the boundaries. */
  def f2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .selectExpr("width_bucket(o_totalprice, 0.0, 600000.0, 12) AS bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  val f2Sql: String =
    """SELECT bucket, count(*) AS cnt FROM (
      |  SELECT CASE
      |    WHEN o_totalprice < 0.0 THEN 0
      |    WHEN o_totalprice >= 600000.0 THEN 13
      |    ELSE CAST(floor(o_totalprice / 600000.0 * 12) AS BIGINT) + 1
      |  END AS bucket FROM orders) b
      |GROUP BY bucket""".stripMargin

  // ------------------------------------------ f3 qdigest sketch
  /** The mergeable log-bucket quantile sketch: per return flag, the
    * sketch median must land inside the exact interquartile range and
    * within 1% relative error of the exact median (its design bound) —
    * both engines emit the same booleans when the sketch is correct. */
  def f3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("qdigest_agg(l_extendedprice)").as("sk"),
        // one sort-aggregate pass for all three exact quantiles
        expr("exact_quantiles(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        expr("value_at_quantile(sk, 0.5)").as("med"),
        // inverse query: rank fraction of the exact median in the sketch
        expr("quantile_at_value(sk, ps[1])").as("rank_med"),
        col("ps")(0).as("p25"), col("ps")(1).as("p50"), col("ps")(2).as("p75"),
        col("n"))
      .select(
        col("l_returnflag"),
        (col("med") >= col("p25") && col("med") <= col("p75")).as("med_in_iqr"),
        (abs(col("med") - col("p50")) <= abs(col("p50")) * 0.011).as("med_within_1pct"),
        (abs(col("rank_med") - 0.5) <= 0.05).as("rank_near_half"),
        col("n"))

  val f3Sql: String =
    """SELECT l_returnflag, TRUE AS med_in_iqr, TRUE AS med_within_1pct,
      |  TRUE AS rank_near_half, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // -------------------------------------- f4 approx_most_frequent
  /** Space-saving heavy hitters. event_type has 5 distinct values <
    * capacity, so the sketch is provably exact here — the oracle pins
    * the exact top-1 and its count. */
  def f4(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(expr("approx_most_frequent(3, event_type)").as("m"))
      .select(
        element_at(map_keys(col("m")), 1).as("top_type"),
        element_at(map_values(col("m")), 1).as("top_cnt"))

  val f4Sql: String =
    """SELECT max_by(event_type, c) AS top_type, max(c) AS top_cnt FROM (
      |  SELECT event_type, count(*) AS c FROM events GROUP BY event_type) t""".stripMargin

  // ------------------------------------------------ f5 simhash LSH
  /** simhash64 near-dup candidates: band the 64-bit fingerprint into
    * four 16-bit chunks and join on chunk equality (no all-pairs) —
    * rows-only (the oracle engine cannot evaluate our fingerprint);
    * the unit suite pins known near-dup pairs. */
  def f5(s: SparkSession, dir: String): DataFrame = {
    val fp = t(s, dir, "documents")
      .selectExpr("doc_id", "simhash64(text) AS fp")
    val chunks = fp.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("ck", expr("(fp >> (chunk * 16)) & 65535"))
    val a = chunks.select(col("chunk").as("chunk_a"), col("ck").as("ck_a"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = chunks.select(col("chunk").as("chunk_b"), col("ck").as("ck_b"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, col("chunk_a") === col("chunk_b") && col("ck_a") === col("ck_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b, 64)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
  }

  // ------------------------------------------------------------- exports
  // ------------------------------------------ f6 t-digest sketch
  /** The centroid t-digest (distinct from f3's log-bucket qdigest,
    * mirroring the reference's separate TDigest type): per return
    * flag, sketch quantiles must sit within rank-error-derived bands
    * of the exact percentiles, quantiles must be monotone, and
    * trimmed_mean(0.25, 0.75) must match the EXACT mean of the
    * interquartile values (second aggregation pass over lineitem,
    * broadcast of the 3-row bounds) within 1.5%. Booleans per the
    * sketch oracle protocol. */
  def f6(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // diamond: `agg` feeds both the trimmed-range broadcast and the
    // final join, so its lineage executes twice per run. A lazy
    // checkpoint was tried here (r20) and REVERTED: under honest
    // per-sample timing a checkpointed query must rebuild per bench
    // sample (else the warm pass caches the census for every timed
    // sample), and the rebuild's per-sample planning overhead costs
    // MORE at the benched scale than re-running the aggregate
    // (0.78 s rebuilt-checkpoint vs 0.48 s prepared-diamond at sf0.1).
    // At cluster scale the crossover flips — a materialized 4-row
    // census beats a second full scan — so this is the documented
    // candidate to re-checkpoint when the deployment scale justifies
    // it, not a plan defect.
    val agg = li.groupBy(col("l_returnflag"))
      .agg(expr("tdigest_agg(l_extendedprice)").as("td"),
        expr("exact_quantiles(l_extendedprice, array(0.01, 0.25, 0.5, 0.75, 0.99))")
          .as("ps"),
        count(lit(1)).as("n"))
    val exact = li
      .join(broadcast(agg.select(col("l_returnflag").as("rf"),
        col("ps")(1).as("lo"), col("ps")(3).as("hi"))),
        col("l_returnflag") === col("rf"))
      .filter(col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") <= col("hi"))
      .groupBy(col("l_returnflag")).agg(avg(col("l_extendedprice")).as("tm_exact"))
    agg.join(exact, "l_returnflag")
      .select(col("l_returnflag"),
        (abs(expr("value_at_quantile(td, 0.5)") - col("ps")(2))
          <= (col("ps")(3) - col("ps")(1)) * 0.02).as("med_close"),
        (abs(expr("value_at_quantile(td, 0.01)") - col("ps")(0))
          <= (col("ps")(4) - col("ps")(0)) * 0.02).as("p01_close"),
        (abs(expr("value_at_quantile(td, 0.99)") - col("ps")(4))
          <= (col("ps")(4) - col("ps")(0)) * 0.02).as("p99_close"),
        (expr("value_at_quantile(td, 0.25)") <= expr("value_at_quantile(td, 0.5)")
          && expr("value_at_quantile(td, 0.5)")
          <= expr("value_at_quantile(td, 0.75)")).as("mono"),
        (abs(expr("trimmed_mean(td, 0.25, 0.75)") - col("tm_exact"))
          <= col("tm_exact") * 0.015).as("tm_close"),
        col("n"))
  }

  val f6Sql: String =
    """SELECT l_returnflag, TRUE AS med_close, TRUE AS p01_close,
      |  TRUE AS p99_close, TRUE AS mono, TRUE AS tm_close, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ------------------------------------- f7 sketch re-aggregation
  /** The reference's polymorphic `merge(qdigest/tdigest)` aggregate
    * (MergeQuantileDigestFunction): level 1 sketches per return flag,
    * level 2 re-aggregates ONLY the serialized sketches (never
    * rescanning rows) into global digests of both families, queried
    * for quantiles against Spark's exact percentiles. The qdigest
    * bound is the α=1% relative-error guarantee; the t-digest median
    * must land between the exact 45th and 55th percentiles (rank
    * error). Booleans per the sketch oracle protocol; n is the
    * exactly-checked rollup of the group counts. */
  def f7(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(expr("qdigest_agg(l_extendedprice)").as("qd"),
        expr("tdigest_agg(l_extendedprice)").as("td"),
        count(lit(1)).as("gn"))
    val global = perGroup.agg(
      expr("merge(qd)").as("gq"),
      expr("merge(td)").as("gt"),
      sum(col("gn")).as("n"))
    val exact = li.agg(
      expr("exact_quantiles(l_extendedprice, array(0.45, 0.5, 0.55, 0.99))").as("ex"))
    global.join(exact)
      .select(
        (abs(expr("value_at_quantile(gq, 0.5)") - col("ex")(1))
          <= abs(col("ex")(1)) * 0.011 + lit(1e-9)).as("q_med_in_bound"),
        (abs(expr("value_at_quantile(gq, 0.99)") - col("ex")(3))
          <= abs(col("ex")(3)) * 0.011 + lit(1e-9)).as("q_p99_in_bound"),
        (expr("value_at_quantile(gt, 0.5)").between(col("ex")(0), col("ex")(2)))
          .as("t_med_in_rank_band"),
        col("n"))
  }

  val f7Sql: String =
    """SELECT TRUE AS q_med_in_bound, TRUE AS q_p99_in_bound,
      |  TRUE AS t_med_in_rank_band, count(*) AS n
      |FROM lineitem""".stripMargin

  // --------------------------------------- f8 bigint qdigest (typed)
  /** Parametric qdigest over an INTEGRAL column (reference
    * `QuantileDigestAggregationFunction.java` binds qdigest(bigint)
    * as its own type): l_quantity has ≤ 50 distinct integer values,
    * so the bigint digest never leaves exact mode and its quantiles
    * are true order statistics — gated as EXACT VALUES against the
    * oracle's explicit rank walk (rank `max(1, ceil(q·n))`), a
    * stronger check than f3's error-bound booleans. The two-level
    * shape (per-(flag,status) sketches merged per flag) additionally
    * proves the exact map survives `merge()` re-aggregation. */
  def f8(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("qty", col("l_quantity").cast("long"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("qdigest_agg(qty)").as("sk"), count(lit(1)).as("gn"))
      .groupBy(col("l_returnflag"))
      .agg(expr("merge(sk)").as("g"), sum(col("gn")).as("n"))
      .select(col("l_returnflag"),
        expr("CAST(value_at_quantile(g, 0.25) AS BIGINT)").as("p25"),
        expr("CAST(value_at_quantile(g, 0.5) AS BIGINT)").as("p50"),
        expr("CAST(value_at_quantile(g, 0.75) AS BIGINT)").as("p75"),
        col("n"))
  }

  val f8Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT l_returnflag, v,
      |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
      |  FROM c)
      |SELECT l_returnflag,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.25 * n) AS BIGINT)) THEN v END) AS p25,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN v END) AS p50,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.75 * n) AS BIGINT)) THEN v END) AS p75,
      |  CAST(max(n) AS BIGINT) AS n
      |FROM w GROUP BY l_returnflag""".stripMargin

  // --------------------------------------- f9 real qdigest (typed)
  /** Parametric qdigest over a REAL (float32) column — the reference's
    * third qdigest binding (`QuantileDigestAggregationFunction.java`
    * is parametric over bigint/real/double). l_discount cast to float
    * has ~11 distinct values on the float lattice, so the real digest
    * stays in exact mode and its quantiles are true order statistics
    * OF FLOAT VALUES — gated as exact values against the oracle's rank
    * walk over `CAST(l_discount AS REAL)` (both engines round the
    * decimal to the same nearest float, and the float widens to the
    * same double). Two-level merge() shape as f8, proving the exact
    * float map survives re-aggregation. */
  def f9(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("disc", col("l_discount").cast("float"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("qdigest_agg(disc)").as("sk"), count(lit(1)).as("gn"))
      .groupBy(col("l_returnflag"))
      .agg(expr("merge(sk)").as("g"), sum(col("gn")).as("n"))
      // batch scalar (reference values_at_quantiles): ONE deserialize
      // serves all three quantiles
      .withColumn("qs", expr("values_at_quantiles(g, array(0.25d, 0.5d, 0.75d))"))
      .select(col("l_returnflag"),
        expr("CAST(qs[0] AS FLOAT)").as("p25"),
        expr("CAST(qs[1] AS FLOAT)").as("p50"),
        expr("CAST(qs[2] AS FLOAT)").as("p75"),
        col("n"))
  }

  val f9Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_discount AS REAL) AS v, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT l_returnflag, v,
      |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
      |  FROM c)
      |SELECT l_returnflag,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.25 * n) AS BIGINT)) THEN v END) AS p25,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN v END) AS p50,
      |  min(CASE WHEN cum >= greatest(1, CAST(ceil(0.75 * n) AS BIGINT)) THEN v END) AS p75,
      |  CAST(max(n) AS BIGINT) AS n
      |FROM w GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_cosine_expr" -> f1 _,
    "f2_width_bucket" -> f2 _,
    "f3_qdigest_quantile" -> f3 _,
    "f4_heavy_hitters" -> f4 _,
    "f5_simhash_lsh" -> f5 _,
    "f6_tdigest" -> f6 _,
    "f7_sketch_reagg" -> f7 _,
    "f8_qdigest_bigint" -> f8 _,
    "f9_qdigest_real" -> f9 _)

  val oracle: Map[String, String] = Map(
    "f1_cosine_expr" -> f1Sql,
    "f2_width_bucket" -> f2Sql,
    "f3_qdigest_quantile" -> f3Sql,
    "f4_heavy_hitters" -> f4Sql,
    "f6_tdigest" -> f6Sql,
    "f7_sketch_reagg" -> f7Sql,
    "f8_qdigest_bigint" -> f8Sql,
    "f9_qdigest_real" -> f9Sql)
    // f5 is rows-only: the fingerprint is engine-specific
}
