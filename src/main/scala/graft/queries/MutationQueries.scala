package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.operators.Mutations

/** Row-level mutation under the oracle gate (reference `SqlBase.g4:68,
  * 176-182` DELETE/UPDATE/MERGE; `operator/MergeWriterOperator.java`):
  * each query copies a pristine source table to a scratch "table"
  * (parquet directory), applies the mutation through
  * [[graft.operators.Mutations]]'s copy-on-write rewrite, and returns
  * the FULL post-mutation table state. The oracle replays the same
  * mutation with DuckDB's native DELETE/UPDATE (+ the MERGE expansion,
  * DuckDB 1.0 has no MERGE statement) on a temp copy, so a lossy
  * rewrite, a wrong predicate NULL treatment, or a broken commit swap
  * all break the hash match on every surviving row.
  *
  * The copy runs fresh on every invocation — mutation queries are
  * destructive by nature, so repeat runs (the bench's three passes)
  * must not re-mutate an already-mutated table. */
object MutationQueries {

  private def sink(dir: String, q: String, table: String): String =
    s"/tmp/graft_sink/${q}_${dir.replaceAll("[^a-z0-9.]", "_")}_" +
      Graft.srcTag(dir, table)

  private def freshCopy(s: SparkSession, dir: String, table: String,
      q: String): String = {
    val path = sink(dir, q, table)
    Graft.load(s, dir, table).write.mode("overwrite").parquet(path)
    path
  }

  /** del1: DELETE FROM orders WHERE status='F' AND totalprice below a
    * cutoff — a narrow filter rewrite; the NULL-predicate rule (NULL
    * keeps the row) is part of the contract. */
  def del1(s: SparkSession, dir: String): DataFrame = {
    val path = freshCopy(s, dir, "orders", "del1")
    Mutations.delete(s, path,
      col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0)
  }

  val del1Sql: String =
    """CREATE OR REPLACE TEMP TABLE del1_t AS SELECT * FROM orders;
      |DELETE FROM del1_t WHERE o_orderstatus = 'F' AND o_totalprice < 100000.0;
      |SELECT * FROM del1_t""".stripMargin

  /** upd1: UPDATE customer SET acctbal += 100, segment rebrand, for
    * high-balance rows. Assignments evaluate against the pre-update
    * row; non-matching rows pass through byte-identical. */
  def upd1(s: SparkSession, dir: String): DataFrame = {
    val path = freshCopy(s, dir, "customer", "upd1")
    Mutations.update(s, path,
      Map("c_acctbal" -> (col("c_acctbal") + 100.0),
        "c_mktsegment" -> lit("PREMIUM")),
      col("c_acctbal") > 5000.0)
  }

  val upd1Sql: String =
    """CREATE OR REPLACE TEMP TABLE upd1_t AS SELECT * FROM customer;
      |UPDATE upd1_t SET c_acctbal = c_acctbal + 100.0, c_mktsegment = 'PREMIUM'
      |WHERE c_acctbal > 5000.0;
      |SELECT * FROM upd1_t""".stripMargin

  /** mrg1: MERGE INTO customer USING a deterministic source of
    * balance revisions (every 7th key) + brand-new keys (every 97th,
    * offset past the key space): matched rows with a revised balance
    * over 9000 are DELETEd, other matches UPDATE c_acctbal, unmatched
    * source rows INSERT. One shuffle join on the merge key; the
    * SQL:2003 one-source-row-per-target rule is asserted in-plan. */
  def mrg1(s: SparkSession, dir: String): DataFrame = {
    val path = freshCopy(s, dir, "customer", "mrg1")
    val cust = Graft.load(s, dir, "customer")
    val source = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), (col("c_acctbal") + 500.0).as("new_bal"))
      .unionByName(cust.filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000L).as("key"), lit(123.45).as("new_bal")))
    Mutations.mergeInto(s, path, source, "c_custkey", "key",
      Mutations.MergeClauses(
        deleteWhen = Some(col("new_bal") > 9000.0),
        updateSet = Map("c_acctbal" -> col("new_bal")),
        insertValues = Some(Seq(col("key"), lit("new customer"),
          lit(0).cast("int"), col("new_bal"), lit("NEW")))))
  }

  val mrg1Sql: String =
    """CREATE OR REPLACE TEMP TABLE mrg1_t AS SELECT * FROM customer;
      |CREATE OR REPLACE TEMP TABLE mrg1_s AS
      |  SELECT c_custkey AS key, c_acctbal + 500.0 AS new_bal
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000 AS key, 123.45 AS new_bal
      |  FROM customer WHERE c_custkey % 97 = 0;
      |DELETE FROM mrg1_t WHERE c_custkey IN
      |  (SELECT key FROM mrg1_s WHERE new_bal > 9000.0);
      |UPDATE mrg1_t SET c_acctbal =
      |  (SELECT new_bal FROM mrg1_s WHERE key = c_custkey)
      |WHERE c_custkey IN (SELECT key FROM mrg1_s WHERE new_bal <= 9000.0);
      |INSERT INTO mrg1_t
      |  SELECT key, 'new customer', 0, new_bal, 'NEW' FROM mrg1_s
      |  WHERE key NOT IN (SELECT c_custkey FROM customer);
      |SELECT * FROM mrg1_t""".stripMargin

  /** trc1: TRUNCATE TABLE through the SQL front-end (grammar
    * `SqlBase.g4:69`) — the post-state is a schema-only empty table;
    * the gate compares the post-state COUNT (a 0-row result would pass
    * vacuously, a count row cannot). */
  def trc1(s: SparkSession, dir: String): DataFrame = {
    val path = freshCopy(s, dir, "supplier", "trc1")
    val after = graft.sqlcompat.MutationSql.translate(
      s, "TRUNCATE TABLE t", { case "t" => path })
    after.agg(count(lit(1)).cast("long").as("n_after"))
  }

  val trc1Sql: String =
    """CREATE OR REPLACE TEMP TABLE trc1_t AS SELECT * FROM supplier;
      |DELETE FROM trc1_t;
      |SELECT CAST(count(*) AS BIGINT) AS n_after FROM trc1_t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "del1_delete" -> del1 _,
    "upd1_update" -> upd1 _,
    "mrg1_merge" -> mrg1 _,
    "trc1_truncate" -> trc1 _)

  val oracle: Map[String, String] = Map(
    "del1_delete" -> del1Sql,
    "upd1_update" -> upd1Sql,
    "mrg1_merge" -> mrg1Sql,
    "trc1_truncate" -> trc1Sql)
}
