package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable operator-semantics library (SURVEY §7.1 `ops/`): DataFrame →
  * DataFrame functions for semantics Spark does not spell natively —
  * the PTF-style surface of SURVEY §2.8 (reference
  * `spi/ptf/ConnectorTableFunction.java`: table-in/table-out functions
  * exposed as API, since Spark has no SQL PTF syntax).
  *
  * Each helper stays fully declarative, so Catalyst plans it like
  * hand-written code: `topNPerGroup`/`limitWithTies` become partial+
  * final WindowGroupLimit (bounded per-partition heaps — see
  * plans/w8_topn_per_group.plan.txt), `unnestWithOrdinality` is a
  * narrow generator with no shuffle.
  */
object Ops {

  /** Top-N rows per group by `order` (reference
    * `TopNRankingOperator.java:1`): appends `rn` (1-based, bigint).
    * `order` must be total within a group for deterministic output. */
  def topNPerGroup(df: DataFrame, n: Int, partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .withColumn("rn", col("rn").cast("long"))
  }

  /** ORDER BY ... FETCH FIRST n ROWS WITH TIES (reference
    * `ImplementLimitWithTies.java`): keeps every row tying with the
    * n-th. Catalyst plans the rank filter as WindowGroupLimit, so only
    * ~n rows per partition reach the final exchange. */
  def limitWithTies(df: DataFrame, n: Int, order: Seq[Column]): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("__rk", rank().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** UNNEST WITH ORDINALITY (reference `UnnestOperator.java:42`):
    * explodes `arr` into (`posName` 1-based bigint, `colName`). */
  def unnestWithOrdinality(df: DataFrame, arr: Column,
      posName: String, colName: String): DataFrame =
    df.select(df.columns.map(col) :+ posexplode(arr).as(Seq("__pos", colName)): _*)
      .withColumn(posName, (col("__pos") + 1).cast("long"))
      .drop("__pos")

  /** Salted equi-join for extreme key skew: rows of the (large,
    * skewed) `big` side scatter across `nSalts` sub-keys via a
    * deterministic hash of `saltBy` (any well-distributed column —
    * typically the primary key), and the `small` side replicates once
    * per salt, so a single hot key's rows land on `nSalts` tasks
    * instead of one. Use when one key's row count exceeds what a task
    * can hold; AQE's skew-join split (enabled in Graft.session)
    * handles the moderate cases automatically — salting is the manual
    * escalation for pathological single-key skew, at the price of
    * replicating the small side `nSalts`×. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltBy: String, nSalts: Int): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(col(saltBy)), lit(nSalts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop("__salt")
  }

  /** GROUPING SETS helper: aggregate the same input at several
    * grouping-column sets in one pass, tagging rows with grouping_id
    * (reference `GroupIdOperator.java:1`). */
  def groupingSetsAgg(df: DataFrame, sets: Seq[Seq[Column]],
      groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupingSets(sets, groupCols: _*)
      .agg(aggs.head, (aggs.tail :+ grouping_id().cast("long").as("gid")): _*)

  /** Interval-partitioned band join: the theta join `lo <= v < hi`
    * rewritten as an equi-join on coarse value buckets plus a
    * residual filter — the scale path for when the BAND table also
    * grows (a broadcast nested-loop join, the plan rj1 demonstrates,
    * stops being viable): each fact row maps to exactly ONE bucket of
    * width w, each band explodes to the buckets it overlaps, and the
    * join becomes a plain shuffled equi-join both sides co-partition
    * on. A band spanning k buckets replicates k times — pick w near
    * the typical band width so replication stays O(1). */
  def intervalBandJoin(fact: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    val f = fact.withColumn("__bkt",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val b = bands.withColumn("__bkt",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    f.join(b, f("__bkt") === b("__bkt") &&
        col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bkt")
  }

  /** Backward AS-OF join: each left row picks the single right row
    * with the greatest `ts` at-or-before the left row's `ts` within
    * the same `key` (LEFT OUTER — unmatched left rows keep null
    * payload). The classic event-to-most-recent-context operator the
    * reference's dialect lacks natively (DuckDB spells it ASOF JOIN —
    * the oracle uses exactly that).
    *
    * Spark-first plan, built for 100 TB event streams: tag the two
    * inputs, `unionByName` them, ONE shuffle on the key, ONE local
    * sort on (ts, side), then `last(struct, ignoreNulls)` over a
    * running ROWS frame carries the most recent right payload forward
    * into each left row. No per-key array build, no range cross
    * product, no binary-search UDF — a streaming window frame that
    * spills like any sort. Right rows sort BEFORE left rows at equal
    * ts, so an exactly-simultaneous right row is visible (`>=`
    * semantics).
    *
    * The whole right payload travels as ONE struct (null on left
    * rows), so a right row whose payload contains NULLs still carries
    * atomically — per-column carry would mix columns across right
    * rows whenever one column is null. Unmatched left rows expand the
    * null struct to all-null payload columns, preserving LEFT OUTER
    * semantics.
    *
    * The right side must be unique per (key, ts) — pre-dedupe it, or
    * the carried payload is nondeterministic (same contract as the
    * oracle engine's ASOF).
    *
    * @param rightPayload right-side column names to carry; must not
    *                     clash with left column names
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String]): DataFrame = {
    val taggedL = left.withColumn("__side", lit(1))
    val taggedR = right
      .select(col(key), col(ts), struct(rightPayload.map(col): _*).as("__pl"))
      .withColumn("__side", lit(0))
    val u = taggedL.unionByName(taggedR, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.select(
      (left.columns.map(col) :+ col("__side")) :+
        last(col("__pl"), ignoreNulls = true).over(w).as("__pl"): _*)
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col("__pl")(c).as(c)): _*)
  }

  /** Connected components over an undirected edge list — the cluster-
    * resolution step a dedup pipeline needs between candidate-pair
    * generation (LSH / fingerprint joins) and keeper selection: near-
    * dup similarity is not transitive, but the de-listing decision is,
    * so pairs must be closed into components first.
    *
    * Iterative min-label propagation: every vertex starts labeled
    * with its own id; each round replaces the label with the minimum
    * over itself and its neighbors' labels, until a fixpoint. Rounds
    * needed = graph diameter, and near-dup components are dense
    * near-cliques (tiny diameter), so the loop converges in 2–4
    * rounds in practice; `maxIter` bounds the worst case.
    *
    * Scale shape: each round is one shuffle on vertex id (a groupBy
    * min over the edge list) plus a join back to the label table —
    * both partition by the same key, no all-pairs, per-key state is
    * one long. Convergence is detected by the monotone label sum
    * (labels only ever decrease), one cheap action per round; each
    * round's result is `localCheckpoint`ed, which BOTH materializes
    * the rows and truncates the logical plan to the checkpointed RDD.
    * Truncation is the load-bearing half: persist alone caches rows
    * but leaves round N's plan nesting round N-1's, and Catalyst's
    * re-analysis cost goes superlinear with iteration count. (On a
    * real cluster, swap in reliable `checkpoint` — same semantics,
    * survives executor loss.)
    *
    * Input must have long columns `src`,`dst` (one row per edge, any
    * orientation). Output: `vertex`, `component` (= min vertex id in
    * the component); isolated vertices never appear because they
    * carry no edge.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 12): DataFrame =
    connectedComponentsStats(edges, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to reach the fixpoint (ScaleSpec asserts rounds ≈ diameter —
    * the property that makes the loop viable at scale). */
  def connectedComponentsStats(edges: DataFrame, maxIter: Int = 12): (DataFrame, Int) = {
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("src").as("vertex")).distinct()
      .select(col("vertex"), col("vertex").as("component"))
      .localCheckpoint(true)
    def sumOf(df: DataFrame): Long = df
      .agg(coalesce(org.apache.spark.sql.functions.sum(col("component")), lit(0L)))
      .head().getLong(0)
    var labelSum = sumOf(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = und.join(labels, und("dst") === labels("vertex"))
        .groupBy(und("src").as("v")).agg(min(col("component")).as("nmin"))
      val next = labels.join(nbrMin, labels("vertex") === nbrMin("v"), "left")
        .select(col("vertex"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val nextSum = sumOf(next)
      labels.unpersist()
      labels = next
      converged = nextSum == labelSum
      labelSum = nextSum
      iter += 1
    }
    und.unpersist()
    (labels, iter)
  }
}
