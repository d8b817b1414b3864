package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** Hand-computed semantics for the D31–D33 event-analytics operators. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("time-weighted average weights each value by its holding duration") {
    // user 1: v=100 held for 10us, then v=300 held for 30us, last event
    // open-ended (excluded). twa = (100*10 + 300*30) / 40 = 250.0
    val ev = Seq((1L, 0L, 100L), (1L, 10L, 300L), (1L, 40L, 999L))
      .toDF("user_id", "ts_us", "v_cents")
    val r = Analytics.timeWeightedAvg(ev).collect()(0)
    assert(r.getLong(1) == 100L * 10 + 300L * 30)
    assert(r.getLong(2) == 40L)
    assert(r.getDouble(3) == 250.0)
  }

  test("funnel demands strict temporal order across steps") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE view, purchase after — click doesn't count,
      // so the funnel stalls at stage 1
      (2L, 20L, "view"), (2L, 10L, "click"), (2L, 30L, "purchase"),
      // user 3: view only
      (3L, 10L, "view"),
      // user 4: never viewed -> not in the funnel at all
      (4L, 10L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val out = Analytics.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("cohort retention counts distinct users per (cohort, offset) week") {
    val wk = 604800000000L
    val ev = Seq(
      (1L, 0L), (1L, wk + 1), (1L, 2 * wk + 1),   // cohort 0, offsets 0,1,2
      (2L, 5L), (2L, 2 * wk + 9),                 // cohort 0, offsets 0,2
      (3L, wk + 7), (3L, wk + 8))                 // cohort 1, offset 0 (dedup)
      .toDF("user_id", "ts_us")
    val out = Analytics.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("D57: EWMA folds in time order regardless of row order, exact halves") {
    import spark.implicits._
    // time order 100, 50, 30: s = 0 → 50 → 50 → 40
    val rows = Seq(
      (1L, 300L, 3L, 30L), (1L, 100L, 1L, 100L), (1L, 200L, 2L, 50L),
      (2L, 100L, 9L, 7L)) // single txn: (0+7) div 2 = 3 (floor)
    val out = Analytics.ewmaBaseline(
      rows.toDF("user_id", "ts_us", "event_id", "amt_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((3L, 40L)), 2L -> ((1L, 3L))))
    // tie on ts: event_id breaks it — (0+10)/2=5, (5+20)/2=12 vs
    // reversed would be (0+20)/2=10, (10+10)/2=10
    val tie = Seq((1L, 100L, 1L, 10L), (1L, 100L, 2L, 20L))
    val r = Analytics.ewmaBaseline(
      tie.toDF("user_id", "ts_us", "event_id", "amt_cents"))
      .collect().head
    assert(r.getLong(2) == 12L)
  }
}
