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
    val direct = line.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14))).as("direct_est"))
    direct.join(merged)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hll1_sketch_merge" -> hll1 _)

  val oracle: Map[String, String] = Map(
    "hll1_sketch_merge" -> hll1Sql)
}
