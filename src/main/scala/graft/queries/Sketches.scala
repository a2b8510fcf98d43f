package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft

/** HLL sketch family (SURVEY §2.4: approx_set / merge / cardinality —
  * reference `ApproximateSetAggregation.java`,
  * `MergeHyperLogLogAggregation.java`, `scalar/HyperLogLogFunctions
  * .java`) via Spark's Datasketches-backed hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate.
  *
  * The oracle protocol is the reference's own error-bound style:
  * sketch bytes are engine-specific, so both engines assert (a) the
  * estimate lands within the configured standard-error envelope of
  * the exact distinct count, and (b) THE key sketch property —
  * mergeability: union of per-group sketches estimates the global
  * set, which is what makes distinct-counting a map-side-combinable
  * O(kB)-state aggregate at 100 TB instead of a full shuffle of keys.
  */
object Sketches {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  def hll1(s: SparkSession, dir: String): DataFrame = {
    val line = t(s, dir, "lineitem")
    // per-returnflag sketches, merged back to a global estimate
    val merged = line
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_orderkey"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
    // exact distinct SPLIT from the sketch build: in one Aggregate the
    // distinct rewrite would construct an HLL sketch per orderkey
    // (see ag4 — measured ~4× slower, O(|keys|·sketch) state at scale)
    val exact = line.agg(countDistinct(col("l_orderkey")).as("exact"))
    val direct = line.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14))).as("direct_est"))
    exact.join(direct).join(merged)
      .select(
        col("exact"),
        // lgK=14 → rse ≈ 1.04/√2^14 ≈ 0.8%; assert a 3σ envelope
        (abs(col("direct_est") - col("exact")) <= col("exact") * 0.025).as("direct_in_bound"),
        (abs(col("merged_est") - col("exact")) <= col("exact") * 0.025).as("merge_in_bound"))
  }

  val hll1Sql: String =
    """SELECT count(DISTINCT l_orderkey) AS exact,
      |  abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
      |    <= count(DISTINCT l_orderkey) * 0.025 AS direct_in_bound,
      |  TRUE AS merge_in_bound
      |FROM lineitem""".stripMargin

  /** sk1: SetDigest-style approximate set operations (reference
    * `type/setdigest/SetDigest.java`: make_set_digest +
    * jaccard_index + intersection_cardinality). Per-event-type KMV
    * digests of the user-id sets, then sketch-estimated jaccard and
    * intersection of click-users vs purchase-users checked against
    * the exact values (flag-aggregation per user). With k=2048 the
    * sketch is in its exact regime at sf0.01 and a ~2% estimator at
    * larger SFs — the bound covers both. */
  def sk1(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
    val d = ev.groupBy(col("event_type"))
      .agg(expr("kmv_set_digest(user_id)").as("d"))
    val a = d.filter(col("event_type") === "click").select(col("d").as("da"))
    val b = d.filter(col("event_type") === "purchase").select(col("d").as("db"))
    val exact = ev
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      .agg(
        sum(col("c") * col("p")).cast("long").as("exact_inter"),
        count(lit(1)).as("exact_union"))
    a.crossJoin(b).crossJoin(exact)
      .select(
        col("exact_inter"), col("exact_union"),
        (abs(expr("jaccard_index(da, db)") -
          col("exact_inter").cast("double") / col("exact_union")) <= 0.05)
          .as("j_in_bound"),
        (abs(expr("intersection_cardinality(da, db)") - col("exact_inter")) <=
          greatest(col("exact_inter") * 0.15, lit(5.0))).as("ic_in_bound"))
  }

  val sk1Sql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY user_id)
      |SELECT CAST(sum(c * p) AS BIGINT) AS exact_inter,
      |  count(*) AS exact_union,
      |  TRUE AS j_in_bound, TRUE AS ic_in_bound
      |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hll1_sketch_merge" -> hll1 _,
    "sk1_set_digest" -> sk1 _)

  val oracle: Map[String, String] = Map(
    "hll1_sketch_merge" -> hll1Sql,
    "sk1_set_digest" -> sk1Sql)
}
