package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.engine.Num._

/** Set operations, grouping sets, UNNEST, VALUES relations, and the
  * limit/offset/sample corner of the operator inventory.
  *
  * Capability match (SURVEY §2.7/2.4/2.8/2.6): UNION/INTERSECT/EXCEPT
  * [ALL] (`sql/planner/plan/UnionNode.java`, `ImplementIntersectAll
  * .java`, `ImplementExceptAll.java` — Spark plans the ALL variants
  * with the same union+replicate-rows trick), GROUPING SETS / ROLLUP /
  * CUBE + grouping_id (`operator/GroupIdOperator.java:1`, grammar
  * `SqlBase.g4:272-276`), UNNEST with ordinality (`operator/unnest/
  * UnnestOperator.java:42`), VALUES (`operator/ValuesOperator.java:1`),
  * OFFSET / FETCH WITH TIES (`ImplementOffset.java`,
  * `ImplementLimitWithTies.java` — ties expressed as the rank()<=n
  * rewrite on both engines), TABLESAMPLE (`SampleNode.java:38`), and
  * AssignUniqueId (`operator/AssignUniqueIdOperator.java:1`).
  *
  * Scale notes (100 TB): set ops are pure shuffles on the compared
  * columns (distinct variants) or no shuffle at all (UNION ALL —
  * partition concatenation); grouping sets expand rows AFTER partial
  * aggregation when Catalyst can (expand → partial → final keeps the
  * map-side combine); unnest is per-row generation with no shuffle;
  * the VALUES side of un3 is a LocalRelation → broadcast join, never a
  * shuffle of the big side.
  */
object SetOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.load(s, dir, name)

  private def ts(d: String): org.apache.spark.sql.Column = to_timestamp(lit(d))

  // ------------------------------------------------------ set1 UNION ALL
  /** UNION ALL (plan concatenation, no shuffle) then re-aggregate. */
  def set1(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 400000.0).select(col("o_orderpriority"))
    val recent = o.filter(col("o_orderdate") >= ts("1997-01-01")).select(col("o_orderpriority"))
    big.unionAll(recent).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
  }

  val set1Sql: String =
    """SELECT o_orderpriority, count(*) AS cnt FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000.0
      |  UNION ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |) u GROUP BY o_orderpriority""".stripMargin

  // ------------------------------------------------- set2 UNION distinct
  /** UNION (distinct): nations present on either side of the market. */
  def set2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nkey")))
      .distinct()

  val set2Sql: String =
    """SELECT c_nationkey AS nkey FROM customer
      |UNION
      |SELECT s_nationkey AS nkey FROM supplier""".stripMargin

  // ------------------------------------------------------ set3 INTERSECT
  /** INTERSECT: customers ordering in both 1996 and 1997. */
  def set3(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      .intersect(o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")))
  }

  val set3Sql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997""".stripMargin

  // ------------------------------------------------ set4 INTERSECT ALL
  /** INTERSECT ALL: multiset min-multiplicity semantics over
    * (custkey, priority) pairs from two overlapping date ranges. */
  def set4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderdate") < ts("1997-01-01"))
      .select(col("o_custkey"), col("o_orderpriority"))
    val b = o.filter(col("o_orderdate") >= ts("1996-01-01"))
      .select(col("o_custkey"), col("o_orderpriority"))
    a.intersectAll(b)
  }

  val set4Sql: String =
    """SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT ALL
      |SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'""".stripMargin

  // --------------------------------------------------------- set5 EXCEPT
  /** EXCEPT: customers with orders but never an urgent one. */
  def set5(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select(col("o_custkey"))
      .except(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
  }

  val set5Sql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  // ----------------------------------------------------- set6 EXCEPT ALL
  /** EXCEPT ALL: per-customer order multiset minus the urgent multiset
    * (multiplicity = total orders − urgent orders). */
  def set6(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
  }

  val set6Sql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  // --------------------------------------------------------- gs1 ROLLUP
  /** ROLLUP with grouping_id: revenue at (flag,status), (flag), ()
    * levels. Spark's native ROLLUP expands every input row once per
    * level (3x the fact table through the aggregate); because SUM and
    * COUNT are decomposable and the base grouping is tiny (~6 keys),
    * we aggregate the fact ONCE at the finest level and roll the
    * 6-row intermediate up — algebraically identical (exact decimal
    * sums re-aggregate associatively), and at 100 TB it shuffles the
    * fact once instead of three times. gs2/gs3 keep the native
    * expand-based operator where the input is already small. */
  def gs1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // limb pair instead of a decimal: stays primitive-long through
        // BOTH aggregation levels (limbs are composable — summing
        // (hi, lo) pairs preserves value = hi*10^6 + lo exactly).
        sumLimbsLong(revenueU(col("l_extendedprice"), col("l_discount")))._1.as("rev_hi"),
        sumLimbsLong(revenueU(col("l_extendedprice"), col("l_discount")))._2.as("rev_lo"),
        count(lit(1)).as("n"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        limbsToDecimal(sum(col("rev_hi")), sum(col("rev_lo")), 4)
          .cast("double").as("revenue"),
        sum(col("n")).cast("long").as("cnt"),
        grouping_id().cast("long").as("gid"))

  val gs1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS cnt,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // ----------------------------------------------------------- gs2 CUBE
  /** CUBE over two independent dimensions + grouping_id. */
  def gs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), grouping_id().cast("long").as("gid"))

  val gs2Sql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
      |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  // ------------------------------------------------- gs3 GROUPING SETS
  /** Explicit GROUPING SETS ((region), (nation)): two aggregation
    * levels of the customer dimension hierarchy in one scan. */
  def gs3(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    graft.operators.Ops.groupingSetsAgg(joined,
      sets = Seq(Seq(col("r_name")), Seq(col("n_name"))),
      groupCols = Seq(col("r_name"), col("n_name")),
      aggs = Seq(count(lit(1)).as("cnt"),
        decSumLong(unscaled2dp(col("c_acctbal")), 2).cast("double").as("bal")))
  }

  val gs3Sql: String =
    """SELECT r_name, n_name, count(*) AS cnt,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
      |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
      |FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name))""".stripMargin

  // ----------------------------------------------- un1 UNNEST(sequence)
  /** Lateral array generation + explode, re-aggregated: row counts per
    * generated index (UNNEST of a computed array). */
  def un1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(explode(sequence(lit(1), col("l_linenumber"))).as("i0"))
      .select(col("i0").cast("long").as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("cnt"))

  val un1Sql: String =
    """SELECT i, count(*) AS cnt
      |FROM lineitem, unnest(generate_series(1, l_linenumber)) AS u(i)
      |GROUP BY i""".stripMargin

  // ----------------------------------- un2 UNNEST WITH ORDINALITY
  /** posexplode = UNNEST WITH ORDINALITY: tokens of the first 50
    * documents with their 1-based positions. */
  def un2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ops.unnestWithOrdinality(
        t(s, dir, "documents").filter(col("doc_id") < 50)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        col("w"), "pos", "token")
      .select(col("doc_id"), col("pos"), col("token"))

  val un2Sql: String =
    """SELECT doc_id,
      |  generate_subscripts(string_split(text, ' '), 1) AS pos,
      |  unnest(string_split(text, ' ')) AS token
      |FROM documents WHERE doc_id < 50""".stripMargin

  // -------------------------------------------------- un3 VALUES join
  /** Inline VALUES relation (LocalRelation) broadcast-joined to a fact
    * table: event-type severity weighting. */
  def un3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sev = Seq(("click", 1), ("view", 2), ("purchase", 5), ("error", 10))
      .toDF("event_type", "sev")
    t(s, dir, "events")
      .join(broadcast(sev), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("sev")).cast("long").as("sev_total"))
  }

  val un3Sql: String =
    """SELECT e.event_type, count(*) AS n, CAST(sum(v.sev) AS BIGINT) AS sev_total
      |FROM events e
      |JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 5), ('error', 10)) AS v(event_type, sev)
      |  ON e.event_type = v.event_type
      |GROUP BY e.event_type""".stripMargin

  // ------------------------------------------------------- lim1 OFFSET
  /** ORDER BY ... LIMIT 50 OFFSET 100 (rows 101–150 of a total order). */
  def lim1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(100).limit(50)
      .select(col("o_orderkey"), col("o_totalprice"))

  val lim1Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50 OFFSET 100""".stripMargin

  // ------------------------------------------- lim2 FETCH WITH TIES
  /** FETCH FIRST 10 ROWS WITH TIES — expressed as the rank()<=10
    * rewrite (the reference plans it the same way:
    * `ImplementLimitWithTies.java`). Although the window is global,
    * Catalyst plans it as partial+final WindowGroupLimit (see
    * plans/lim2_with_ties.plan.txt): each partition pre-prunes to its
    * local top-10-with-ties, so the single-partition exchange carries
    * O(10 × partitions) rows — scale-safe. */
  def lim2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ops.limitWithTies(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      10, Seq(col("o_totalprice").desc))

  val lim2Sql: String =
    """SELECT o_orderkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_totalprice, rank() OVER (ORDER BY o_totalprice DESC) AS rk
      |  FROM orders) r
      |WHERE rk <= 10""".stripMargin

  // -------------------------------------------- lim3 DISTINCT LIMIT
  /** SELECT DISTINCT ... LIMIT n (DistinctLimitOperator shape). The
    * limit exceeds the domain so the result set stays deterministic. */
  def lim3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderpriority")).distinct().limit(10)

  val lim3Sql: String =
    "SELECT DISTINCT o_orderpriority FROM orders LIMIT 10"

  // ---------------------------------------------- smp1 TABLESAMPLE
  /** Bernoulli TABLESAMPLE. Engines use different RNGs, so there is no
    * cross-engine oracle — the driver records a rows-only check. The
    * test suite asserts the sampled fraction is within binomial bounds. */
  def smp1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").sample(withReplacement = false, 0.2, seed = 42)
      .select(col("o_orderkey"), col("o_totalprice"))

  // ------------------------------------------ uid1 AssignUniqueId
  /** AssignUniqueId: monotonically_increasing_id assigns a unique id
    * per row with no shuffle and no driver coordination (partition id
    * in the high bits — works on 1000 executors). Ids differ between
    * engines, so the oracle checks the invariant (all unique) plus the
    * row count, both engine-independent. */
  def uid1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("uid", monotonically_increasing_id())
      .agg(
        (countDistinct(col("uid")) === count(lit(1))).as("ids_unique"),
        count(lit(1)).as("cnt"))

  val uid1Sql: String =
    "SELECT TRUE AS ids_unique, count(*) AS cnt FROM orders"

  // ----------------------------------------------- jo1 FULL OUTER join
  /** FULL OUTER join (reference LookupJoinOperator FULL_OUTER variant;
    * never exercised by the TPC-H suite): high-value customers vs
    * high-value suppliers per nation — unmatched rows survive on both
    * sides with nulls. */
  def jo1(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 7000.0)
      .groupBy(col("c_nationkey").as("cn")).agg(count(lit(1)).as("rich_cust"))
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 3000.0)
      .groupBy(col("s_nationkey").as("sn")).agg(count(lit(1)).as("rich_supp"))
    c.join(sup, col("cn") === col("sn"), "full_outer")
      .select(
        coalesce(col("cn"), col("sn")).as("nationkey"),
        coalesce(col("rich_cust"), lit(0)).as("rich_cust"),
        coalesce(col("rich_supp"), lit(0)).as("rich_supp"))
  }

  val jo1Sql: String =
    """SELECT coalesce(cn, sn) AS nationkey,
      |  coalesce(rich_cust, 0) AS rich_cust,
      |  coalesce(rich_supp, 0) AS rich_supp
      |FROM (SELECT c_nationkey AS cn, count(*) AS rich_cust
      |      FROM customer WHERE c_acctbal > 7000.0 GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS sn, count(*) AS rich_supp
      |      FROM supplier WHERE s_acctbal > 3000.0 GROUP BY s_nationkey) s
      |  ON cn = sn""".stripMargin

  // ---------------------------------------------- jo2 RIGHT OUTER join
  /** RIGHT OUTER join: all parts keep a row even with no matching
    * high-quantity lineitem. */
  def jo2(s: SparkSession, dir: String): DataFrame = {
    val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
    bigLines.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"), "right_outer")
      .groupBy(col("p_partkey"))
      .agg(count(col("l_orderkey")).as("big_line_cnt"))
  }

  val jo2Sql: String =
    """SELECT p_partkey, count(l_orderkey) AS big_line_cnt
      |FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) l
      |RIGHT OUTER JOIN part ON l_partkey = p_partkey
      |GROUP BY p_partkey""".stripMargin

  // ------------------------------------- jo3 null-aware NOT IN (anti)
  /** NOT IN over a subquery producing NULLs — the null-aware anti join
    * (reference `TransformCorrelatedInPredicateToJoin.java` null
    * semantics): any NULL in the subquery empties the NOT IN result
    * for non-matching rows unless three-valued logic says otherwise.
    * Here the inner side has no NULL keys after its filter, but the
    * nullable expression forces Catalyst to plan the null-aware
    * variant. */
  def jo3(s: SparkSession, dir: String): DataFrame = {
    val s2 = s
    import s2.implicits._
    Graft.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 400000.0)
        |""".stripMargin)
  }

  val jo3Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 400000.0)""".stripMargin

  // ----------------------------------------- nv1 NULL semantics fixture
  /** Engine-only NULL-semantics corpus over an inline VALUES relation
    * (the reference's `AbstractTestEngineOnlyQueries` style — both
    * engines evaluate the IDENTICAL literal table): IGNORE NULLS value
    * functions, count(*) vs count(col), null-skipping sums, and
    * three-valued-logic scalar ops. */
  def nv1(s: SparkSession, dir: String): DataFrame =
    s.sql(
      """SELECT grp, ord,
        |  lag(v, 1) IGNORE NULLS OVER w AS lag_ig,
        |  last_value(v) IGNORE NULLS OVER
        |    (PARTITION BY grp ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ig,
        |  count(*) OVER (PARTITION BY grp) AS cnt_all,
        |  count(v) OVER (PARTITION BY grp) AS cnt_v,
        |  CAST(sum(v) OVER (PARTITION BY grp) AS BIGINT) AS sum_v,
        |  coalesce(v, -1) AS co,
        |  nullif(v, 30) AS ni,
        |  (v > 20) AS gt20
        |FROM VALUES
        |  (1, 1, 10), (1, 2, CAST(NULL AS INT)), (1, 3, 30), (1, 4, CAST(NULL AS INT)),
        |  (1, 5, 50), (2, 1, CAST(NULL AS INT)), (2, 2, CAST(NULL AS INT)), (2, 3, 7)
        |  AS t(grp, ord, v)
        |WINDOW w AS (PARTITION BY grp ORDER BY ord)""".stripMargin)

  val nv1Sql: String =
    """SELECT grp, ord,
      |  lag(v, 1 IGNORE NULLS) OVER w AS lag_ig,
      |  last_value(v IGNORE NULLS) OVER
      |    (PARTITION BY grp ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ig,
      |  count(*) OVER (PARTITION BY grp) AS cnt_all,
      |  count(v) OVER (PARTITION BY grp) AS cnt_v,
      |  CAST(sum(v) OVER (PARTITION BY grp) AS BIGINT) AS sum_v,
      |  coalesce(v, -1) AS co,
      |  nullif(v, 30) AS ni,
      |  (v > 20) AS gt20
      |FROM (VALUES
      |  (1, 1, 10), (1, 2, CAST(NULL AS INT)), (1, 3, 30), (1, 4, CAST(NULL AS INT)),
      |  (1, 5, 50), (2, 1, CAST(NULL AS INT)), (2, 2, CAST(NULL AS INT)), (2, 3, 7))
      |  AS t(grp, ord, v)
      |WINDOW w AS (PARTITION BY grp ORDER BY ord)""".stripMargin

  // --------------------------------------- nv2 explicit NULL ordering
  /** NULLS FIRST / NULLS LAST pinned explicitly on both engines —
    * necessary because the engines' DEFAULTS disagree (Spark ASC =
    * NULLS FIRST, the oracle engine ASC = NULLS LAST), exactly the
    * class of silent divergence the reference's engine-only corpus
    * exists to catch. */
  def nv2(s: SparkSession, dir: String): DataFrame =
    s.sql(
      """SELECT ord, v,
        |  row_number() OVER (ORDER BY v ASC NULLS FIRST, ord) AS rn_nf,
        |  row_number() OVER (ORDER BY v ASC NULLS LAST, ord) AS rn_nl,
        |  row_number() OVER (ORDER BY v DESC NULLS FIRST, ord) AS rn_dnf
        |FROM VALUES (1, 5), (2, CAST(NULL AS INT)), (3, 1), (4, CAST(NULL AS INT)), (5, 9)
        |  AS t(ord, v)""".stripMargin)
      .selectExpr("ord", "v", "CAST(rn_nf AS BIGINT) AS rn_nf",
        "CAST(rn_nl AS BIGINT) AS rn_nl", "CAST(rn_dnf AS BIGINT) AS rn_dnf")

  val nv2Sql: String =
    """SELECT ord, v,
      |  row_number() OVER (ORDER BY v ASC NULLS FIRST, ord) AS rn_nf,
      |  row_number() OVER (ORDER BY v ASC NULLS LAST, ord) AS rn_nl,
      |  row_number() OVER (ORDER BY v DESC NULLS FIRST, ord) AS rn_dnf
      |FROM (VALUES (1, 5), (2, CAST(NULL AS INT)), (3, 1), (4, CAST(NULL AS INT)), (5, 9))
      |  AS t(ord, v)""".stripMargin

  // --------------------------------------------- rc1 recursive CTE
  /** WITH RECURSIVE (reference grammar `SqlBase.g4` namedQuery +
    * RECURSIVE; Trino supports linear recursion since 352) — Spark 4
    * plans it as an iterative UnionLoop. Workload: walk every supplier
    * up a synthetic binary org-chart (parent = suppkey halved) to the
    * root and roll up population by depth — the transitive-closure
    * shape (org charts, BOM explosions, graph reachability) that only
    * recursion expresses in SQL. Each iteration is a distributed step
    * over the frontier; depth is bounded by log2(|supplier|), so the
    * loop runs ~log n distributed steps at any scale. */
  def rc1(s: SparkSession, dir: String): DataFrame = {
    Graft.load(s, dir, "supplier").createOrReplaceTempView("supplier_rc")
    s.sql(
      """WITH RECURSIVE up(start_key, cur, depth) AS (
        |  SELECT s_suppkey, s_suppkey, 0 FROM supplier_rc
        |  UNION ALL
        |  SELECT start_key, cur DIV 2, depth + 1 FROM up WHERE cur > 1
        |)
        |SELECT depth AS root_depth, count(*) AS n_suppliers
        |FROM (SELECT start_key, max(depth) AS depth FROM up GROUP BY start_key)
        |GROUP BY depth""".stripMargin)
  }

  val rc1Sql: String =
    """WITH RECURSIVE up(start_key, cur, depth) AS (
      |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
      |  UNION ALL
      |  SELECT start_key, cur // 2, depth + 1 FROM up WHERE cur > 1
      |)
      |SELECT depth AS root_depth, count(*) AS n_suppliers
      |FROM (SELECT start_key, max(depth) AS depth FROM up GROUP BY start_key)
      |GROUP BY depth""".stripMargin

  // ----------------------------------------------- lat1 LATERAL join
  /** Explicit LATERAL derived table (reference grammar `SqlBase.g4`
    * LATERAL; planner `CorrelatedJoinNode`): top-2 customers by
    * balance per nation, the correlated-TOP-N-per-outer-row shape.
    * Catalyst decorrelates the LATERAL subquery into a join +
    * per-partition WindowGroupLimit rather than re-executing it per
    * outer row — the plan a 100 TB run needs (one shuffle on the
    * correlation key, bounded per-group state). Total order via the
    * (acctbal DESC, custkey) tie-break so both engines pick identical
    * rows. */
  def lat1(s: SparkSession, dir: String): DataFrame = {
    Graft.load(s, dir, "nation").createOrReplaceTempView("nation_lat")
    Graft.load(s, dir, "customer").createOrReplaceTempView("customer_lat")
    s.sql(
      """SELECT n_name, t.c_custkey, t.c_name, t.c_acctbal
        |FROM nation_lat, LATERAL (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer_lat
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
  }

  val lat1Sql: String =
    """SELECT n_name, t.c_custkey, t.c_name, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin

  // ------------------------------------------------------------- exports
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rc1_recursive_cte" -> rc1 _,
    "lat1_lateral_topn" -> lat1 _,
    "set1_union_all" -> set1 _,
    "set2_union" -> set2 _,
    "set3_intersect" -> set3 _,
    "set4_intersect_all" -> set4 _,
    "set5_except" -> set5 _,
    "set6_except_all" -> set6 _,
    "gs1_rollup" -> gs1 _,
    "gs2_cube" -> gs2 _,
    "gs3_grouping_sets" -> gs3 _,
    "un1_unnest_series" -> un1 _,
    "un2_unnest_ordinality" -> un2 _,
    "un3_values_join" -> un3 _,
    "lim1_offset" -> lim1 _,
    "lim2_with_ties" -> lim2 _,
    "lim3_distinct_limit" -> lim3 _,
    "smp1_tablesample" -> smp1 _,
    "uid1_assign_unique_id" -> uid1 _,
    "jo1_full_outer" -> jo1 _,
    "jo2_right_outer" -> jo2 _,
    "jo3_null_aware_anti" -> jo3 _,
    "nv1_null_semantics" -> nv1 _,
    "nv2_null_ordering" -> nv2 _)

  val oracle: Map[String, String] = Map(
    "rc1_recursive_cte" -> rc1Sql,
    "lat1_lateral_topn" -> lat1Sql,
    "set1_union_all" -> set1Sql,
    "set2_union" -> set2Sql,
    "set3_intersect" -> set3Sql,
    "set4_intersect_all" -> set4Sql,
    "set5_except" -> set5Sql,
    "set6_except_all" -> set6Sql,
    "gs1_rollup" -> gs1Sql,
    "gs2_cube" -> gs2Sql,
    "gs3_grouping_sets" -> gs3Sql,
    "un1_unnest_series" -> un1Sql,
    "un2_unnest_ordinality" -> un2Sql,
    "un3_values_join" -> un3Sql,
    "lim1_offset" -> lim1Sql,
    "lim2_with_ties" -> lim2Sql,
    "lim3_distinct_limit" -> lim3Sql,
    // smp1 intentionally has no oracle (engine-specific RNG)
    "uid1_assign_unique_id" -> uid1Sql,
    "jo1_full_outer" -> jo1Sql,
    "jo2_right_outer" -> jo2Sql,
    "jo3_null_aware_anti" -> jo3Sql,
    "nv1_null_semantics" -> nv1Sql,
    "nv2_null_ordering" -> nv2Sql)
}
