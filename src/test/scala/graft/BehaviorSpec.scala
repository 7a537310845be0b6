package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("funnel: stage order is enforced, first-touch attribution, ties excluded") {
    val events = Seq(
      // u1: full ordered funnel
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: purchase BEFORE click — stage stops at 2 (order matters)
      (2L, "view", ts(10)), (2L, "purchase", ts(15)), (2L, "click", ts(20)),
      // u3: click at EXACTLY the view time — strict > excludes it, stage 1
      (3L, "view", ts(10)), (3L, "click", ts(10)),
      // u4: no view at all — clicks/purchases can't count, stage 0
      (4L, "click", ts(5)), (4L, "purchase", ts(6)),
      // u5: two views; attribution is FIRST view (t=10), so the click at
      // 12 (after view#1, before view#2) counts — stage 2
      (5L, "view", ts(10)), (5L, "view", ts(50)), (5L, "click", ts(12))
    ).toDF("user_id", "event_type", "ts2")
    val got = Behavior.funnel(events, "user_id", "event_type", "ts2",
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("stage"), col("t_first_us"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3, 10000000L), (2L, 2, 10000000L), (3L, 1, 10000000L),
      (4L, 0, -1L), (5L, 2, 10000000L)), s"got $got")
  }

  test("retention: cohort = first epoch week, duplicate activity collapses") {
    val wk = 7L * 86400L
    val events = Seq(
      // u1 active weeks 0,1,2 (two events in week 1 — counted once)
      (1L, ts(100)), (1L, ts(wk + 100)), (1L, ts(wk + 200)), (1L, ts(2 * wk + 5)),
      // u2 active weeks 0,2
      (2L, ts(500)), (2L, ts(2 * wk + 1)),
      // u3 first seen week 1, active week 2 — a DIFFERENT cohort
      (3L, ts(wk + 50)), (3L, ts(2 * wk + 50)),
      // u4 straddles the epoch: pre-epoch micros must FLOOR to week -1
      // (a truncating div would collapse them into week 0)
      (4L, ts(-100)), (4L, ts(100))
    ).toDF("user_id", "ts2")
    val got = Behavior.retention(events, "user_id", "ts2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (-1L, 0L, 1L), (-1L, 1L, 1L),
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 1L), (1L, 1L, 1L)), s"got $got")
  }

  test("funnel plan: stage scans carry pushed filters, no window/sort over events") {
    val events = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts2")
    val plan = Behavior.funnel(events, "user_id", "event_type", "ts2",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"funnel must not window over raw events:\n$plan")
  }

  test("userGrowth: first-touch buckets, prefix sum, pre-epoch floors down") {
    val wk = 7L * 86400L
    val events = Seq(
      // u1 first seen week 0 (the week-2 repeat must NOT re-count)
      (1L, ts(100)), (1L, ts(2 * wk + 100)),
      // u2 also first seen week 0
      (2L, ts(500)),
      // u3 first seen week 2 (nothing new in week 1)
      (3L, ts(2 * wk + 50)),
      // u4 pre-epoch: -100 s must floor to week -1, not truncate to 0
      (4L, ts(-100))
    ).toDF("user_id", "ts2")
    val got = Behavior.userGrowth(events, "user_id", "ts2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((-1L, 1L, 1L), (0L, 2L, 3L), (2L, 1L, 4L)), s"got $got")
    // final cumulative = total distinct users, by construction
    assert(got.last._3 == 4L)
  }

  test("userGrowth plan: the ordered window runs over the bucket aggregate, not the log") {
    val events = Seq((1L, ts(1))).toDF("user_id", "ts2")
    val df = Behavior.userGrowth(events, "user_id", "ts2")
    val plan = df.queryExecution.optimizedPlan.toString
    // two aggregates (per-user min, per-bucket count) BELOW the window —
    // the window input is |buckets| rows, never raw events
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("Aggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window is not above the aggregates:\n$plan")
  }

  test("lagFeatures: per-user ordering, NULL firsts, micro-exact value deltas") {
    val events = Seq(
      (1L, 100L, ts(10), 1.25), (1L, 101L, ts(30), 1.75), (1L, 102L, ts(30), 0.5),
      (2L, 200L, ts(5), 3.0)
    ).toDF("user_id", "event_id", "ts2", "value")
    val got = Behavior.lagFeatures(events, "user_id", "ts2", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    assert(got == Set(
      // u1: ties at t=30 break by event_id, so 101 precedes 102
      (1L, 100L, 1L, None, None),
      (1L, 101L, 2L, Some(20000000L), Some(500000L)),
      (1L, 102L, 3L, Some(0L), Some(-1250000L)),
      (2L, 200L, 1L, None, None)))
  }

  test("coOccurrence: support counts distinct users per pair; cap drops the user's coldest items") {
    val ev = Seq(
      // u1 basket {1,2,3} (item 3 twice — still one membership)
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L),
      // u2 basket {1,2}
      (2L, 1L), (2L, 2L),
      // u3 basket {2,3}
      (3L, 2L), (3L, 3L)
    ).toDF("user_id", "item")
    val got = Behavior.coOccurrence(ev, "user_id", "item",
        minSupport = 2, capPerUser = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (2L, 3L, 2L)))
    // cap=2: u1 keeps items by (freq desc, item) = {3, 1} → pair (1,3)
    // only; (1,2)/(2,3) lose u1's membership and fall under support 2
    val capped = Behavior.coOccurrence(ev, "user_id", "item",
        minSupport = 1, capPerUser = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((1L, 3L, 1L), (1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("coOccurrence plan: cap is WindowGroupLimit; pair join is user-keyed, never cartesian") {
    // fixture must be big enough that the optimizer can't prove the
    // rank filter redundant (maxRows > cap), as at real scale
    val ev = spark.range(1000).selectExpr("id % 20 AS user_id", "id % 37 AS item")
    val p = Behavior.coOccurrence(ev, "user_id", "item", 1, 5)
      .queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"), s"cap not group-limited:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian pair join:\n$p")
  }

  test("lagFeatures plan: one user-key exchange, no global sort") {
    val events = Seq((1L, 1L, ts(1), 1.0)).toDF("user_id", "event_id", "ts2", "value")
    val plan = Behavior.lagFeatures(events, "user_id", "ts2", "event_id", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"))
    assert(!plan.contains("rangepartitioning"),
      s"global sort crept into the window plan:\n$plan")
  }
}
