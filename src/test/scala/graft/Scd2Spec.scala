package graft

import graft.etl.{Scd2, Scd2Snapshots}

/** B5 — full SCD2 merge semantics beyond what the oracle queries pin. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def mkDim(rows: Seq[(Long, String, String)]) =
    rows.toDF("terminal_id", "terminal_type", "terminal_city")

  private val attrs = Seq("terminal_type", "terminal_city")

  test("detect new/deleted/changed on a toy dimension") {
    val day1 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Oslo"), (3L, "ATM", "Lima")))
    val day2 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Bern"), (4L, "POS", "Kiev")))
    assert(Scd2.detectNew(day1, day2, "terminal_id").collect().map(_.getLong(0)).toSet == Set(4L))
    assert(Scd2.detectDeleted(day1, day2, "terminal_id").collect().map(_.getLong(0)).toSet == Set(3L))
    assert(Scd2.detectChanged(day1, day2, "terminal_id", attrs)
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("merge closes old versions, inserts replacements and tombstones") {
    val day1 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Oslo"), (3L, "ATM", "Lima")))
    val day2 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Bern"), (4L, "POS", "Kiev")))
    val hist = Scd2.merge(Scd2.init(day1, "d1"), day2, "terminal_id", attrs, "d2")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSet
    // unchanged key 1: one open row from d1
    assert(hist.contains((1L, "Rome", "d1", Scd2.HighDate, 0L)))
    // changed key 2: closed d1 row + open d2 row
    assert(hist.contains((2L, "Oslo", "d1", "d2", 0L)))
    assert(hist.contains((2L, "Bern", "d2", Scd2.HighDate, 0L)))
    // deleted key 3: closed row + tombstone
    assert(hist.contains((3L, "Lima", "d1", "d2", 0L)))
    assert(hist.contains((3L, "Lima", "d2", Scd2.HighDate, 1L)))
    // new key 4
    assert(hist.contains((4L, "Kiev", "d2", Scd2.HighDate, 0L)))
  }

  test("point-in-time join resolves the version covering each fact date") {
    import org.apache.spark.sql.functions.col
    val day1 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Oslo"), (3L, "ATM", "Lima")))
    val day2 = mkDim(Seq((1L, "ATM", "Rome"), (2L, "POS", "Bern"), (4L, "POS", "Kiev")))
    val hist = Scd2.merge(Scd2.init(day1, "2024-01-01"), day2,
      "terminal_id", attrs, "2024-01-02")
    val facts = Seq(
      (10L, 2L, "2024-01-01"), // before change: Oslo
      (11L, 2L, "2024-01-02"), // on change date (half-open): Bern
      (12L, 3L, "2024-01-01"), // before delete: Lima
      (13L, 3L, "2024-01-03"), // after delete: unmatched
      (14L, 9L, "2024-01-01")) // unknown key: unmatched
      .toDF("fact_id", "tid", "fact_dt")
    val out = Scd2.pointInTimeJoin(facts, "tid", "fact_dt", hist, "terminal_id")
      .select(col("fact_id"), col("terminal_city"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(10L -> Some("Oslo"), 11L -> Some("Bern"),
      12L -> Some("Lima"), 13L -> None, 14L -> None))
  }

  test("B30 squash: merges only identical ABUTTING runs; flags and gaps break runs") {
    import spark.implicits._
    val hist = Seq(
      // key A: a 3-run of identical abutting spans → one span
      ("A", "x", "2024-01-01", "2024-01-05", 0L),
      ("A", "x", "2024-01-05", "2024-01-09", 0L),
      ("A", "x", "2024-01-09", "2024-02-01", 0L),
      // key B: identical values but a GAP between spans → kept apart
      ("B", "y", "2024-01-01", "2024-01-10", 0L),
      ("B", "y", "2024-01-15", "2999-12-31", 0L),
      // key C: abutting spans, attrs differ → kept apart
      ("C", "p", "2024-01-01", "2024-01-10", 0L),
      ("C", "q", "2024-01-10", "2999-12-31", 0L),
      // key D: abutting + identical attrs but tombstone flag flips → kept
      ("D", "z", "2024-01-01", "2024-01-10", 0L),
      ("D", "z", "2024-01-10", "2999-12-31", 1L))
      .toDF("k", "attr", "effective_from", "effective_to", "deleted_flg")
    val out = Scd2.squash(hist, "k", Seq("attr")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      ("A", "x", "2024-01-01", "2024-02-01", 0L),
      ("B", "y", "2024-01-01", "2024-01-10", 0L),
      ("B", "y", "2024-01-15", "2999-12-31", 0L),
      ("C", "p", "2024-01-01", "2024-01-10", 0L),
      ("C", "q", "2024-01-10", "2999-12-31", 0L),
      ("D", "z", "2024-01-01", "2024-01-10", 0L),
      ("D", "z", "2024-01-10", "2999-12-31", 1L)))
  }

  test("current view after merge equals the incoming snapshot (minus tombstones)") {
    val day1 = Scd2Snapshots.day1(spark, sf)
    val day2 = Scd2Snapshots.day2(spark, sf)
    val hist = Scd2.merge(Scd2.init(day1, Scd2Snapshots.Day1), day2,
      Scd2Snapshots.Key, Scd2Snapshots.Attrs, Scd2Snapshots.Day2)
    val cur = Scd2.currentView(hist)
      .select(Scd2Snapshots.Key, Scd2Snapshots.Attrs: _*)
    assert(cur.exceptAll(day2).isEmpty && day2.exceptAll(cur).isEmpty)
  }
}
