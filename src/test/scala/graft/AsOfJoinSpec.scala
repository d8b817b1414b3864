package graft

import graft.ops.AsOfJoin

/** As-of join edge semantics: inclusive ties, no-prior sentinel,
  * cross-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    AsOfJoin.lastPriorEvent(
      rows.toDF("event_id", "user_id", "ts_us", "event_type"),
      key = "user_id", timeCol = "ts_us", idCol = "event_id",
      typeCol = "event_type", queryType = "q", refType = "r")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap

  test("picks the latest ref at or before each query; -1 when none") {
    val out = run(Seq(
      (1L, 7L, 100L, "r"),
      (2L, 7L, 200L, "r"),
      (3L, 7L, 250L, "q"),   // latest prior ref = 200
      (4L, 7L, 300L, "q"),   // still 200
      (5L, 8L, 50L, "q")))   // other key, no ref -> -1
    assert(out(3L) == (200L, 50L))
    assert(out(4L) == (200L, 100L))
    assert(out(5L) == (-1L, -1L))
  }

  test("ties are inclusive: a ref at the exact query time matches") {
    val out = run(Seq(
      (1L, 1L, 500L, "r"),
      (2L, 1L, 500L, "q")))
    assert(out(2L) == (500L, 0L))
  }

  test("refs never leak across keys") {
    val out = run(Seq(
      (1L, 1L, 100L, "r"),
      (2L, 2L, 200L, "q")))
    assert(out(2L) == (-1L, -1L))
  }

  test("tolerance: stale matches become no-match, fresh and boundary survive") {
    val rows = Seq(
      (1L, 1L, 100L, "r"),
      (2L, 1L, 150L, "q"),  // gap 50  — inside
      (3L, 1L, 200L, "q"),  // gap 100 — exactly at the bound: inclusive
      (4L, 1L, 500L, "q"),  // gap 400 — stale
      (5L, 2L, 300L, "q"))  // no ref at all
    val out = AsOfJoin.lastPriorEventWithin(
      rows.toDF("event_id", "user_id", "ts_us", "event_type"),
      key = "user_id", timeCol = "ts_us", idCol = "event_id",
      typeCol = "event_type", queryType = "q", refType = "r",
      maxGap = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(2L) == (100L, 50L))
    assert(out(3L) == (100L, 100L))
    assert(out(4L) == (-1L, -1L), "stale match must look like no-match")
    assert(out(5L) == (-1L, -1L))
  }
}
