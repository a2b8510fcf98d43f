package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x4's exchange-reuse guard under dirty data (VERDICT r20 "what's
  * wrong" #2): the session-count branch references event_type only to
  * keep its pruned scan schema identical to the MATCH_RECOGNIZE
  * branch's (so AQE reuses the events exchange). r20's guard
  * (max(CASE WHEN event_type IS NOT NULL THEN sid END)) silently
  * DROPPED sessions whose every event had a NULL type; r21's
  * (max(sid + 0 * length(coalesce(event_type, '')))) must not. This
  * fixture plants exactly that case: a user whose LAST session is
  * all-NULL-typed. */
case class X4Ev(user_id: Long, ts: Timestamp, event_type: String)

class X4NullGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-x4-null-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("n_sessions counts an all-NULL-event_type trailing session") {
    val spk = spark
    import spk.implicits._
    val day = 24L * 60
    val events = Seq(
      // user 1, session 1: converts (view -> click -> purchase)
      X4Ev(1L, ts(0), "view"), X4Ev(1L, ts(1), "click"), X4Ev(1L, ts(2), "purchase"),
      // user 1, session 2 (>12 h later): ONLY NULL-typed events — the
      // case the r20 guard undercounted
      X4Ev(1L, ts(day), null), X4Ev(1L, ts(day + 1), null),
      // user 2: one session, no conversion, with a null mixed in
      X4Ev(2L, ts(0), "view"), X4Ev(2L, ts(1), null), X4Ev(2L, ts(2), "click")
    ).toDF()
    val out = queries.Analytics.x4From(spark, events)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // 2 sessions (NOT 1 — the all-null session counts), 1 converted,
      // view->purchase latency 2 min = 120e6 us
      (1L, 2L, 1L, 120000000L),
      (2L, 1L, 0L, 0L)))
  }

  test("the null-robust guard does not constant-fold away event_type") {
    // if the optimizer ever learns to collapse
    // coalesce(CASE WHEN et IS NOT NULL THEN sid END, sid) to bare
    // sid, the session-count branch's pruned schema would narrow and
    // the exchange reuse (asserted on the real table in ScaleSpec)
    // would silently split into two events scans again — fail loudly
    // here by checking the optimized Aggregate's own expressions
    // (a plan-string contains() is fooled by the Relation column list)
    val ev = graft.engine.Graft.events(spark, "/root/testdata/sf0.001")
    val agg = queries.Analytics.x4From(spark, ev)
      .queryExecution.optimizedPlan.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.aggregateExpressions.exists(_.name == "n_sessions") => a
      }.get
    assert(agg.aggregateExpressions.exists(
        _.references.exists(_.name == "event_type")),
      s"n_sessions guard folded away event_type:\n$agg")
  }
}
