package graft

import scala.util.Random

import graft.etl.Scd2

/** SCD2 merge invariants under randomized snapshot pairs (seeded):
  *   1. currentView(merge(init(s1), s2)) == s2 (modulo row order)
  *   2. versions partition time: one open row per surviving key, closed
  *      versions end at the batch date
  *   3. deleted keys leave exactly one tombstone carrying old attrs
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val attrs = Seq("city")
  private val cities = Seq("Rome", "Oslo", "Lima", "Bern")

  private def randomSnap(rnd: Random): Map[Long, String] =
    (0L to 12L).filter(_ => rnd.nextBoolean())
      .map(k => k -> cities(rnd.nextInt(cities.length))).toMap

  test("merge invariants hold for 12 random snapshot pairs") {
    val rnd = new Random(42)
    for (trial <- 1 to 12) {
      val s1 = randomSnap(rnd)
      val s2 = randomSnap(rnd)
      val d1 = s1.toSeq.toDF("terminal_id", "city")
      val d2 = s2.toSeq.toDF("terminal_id", "city")
      val hist = Scd2.merge(Scd2.init(d1, "d1"), d2, "terminal_id", attrs, "d2")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))

      // (1) current view == incoming snapshot
      val current = hist
        .filter(v => v._5 == 0L && v._4 == Scd2.HighDate)
        .map(v => v._1 -> v._2).toMap
      assert(current == s2, s"trial $trial: current view != snapshot")

      // (2) one open non-deleted row per surviving key; closed rows end at d2
      hist.groupBy(_._1).foreach { case (k, vs) =>
        if (s2.contains(k))
          assert(vs.count(v => v._4 == Scd2.HighDate && v._5 == 0L) == 1,
            s"trial $trial key $k: open-version count")
        assert(vs.filter(_._4 != Scd2.HighDate).forall(_._4 == "d2"),
          s"trial $trial key $k: closed version end date")
      }

      // (3) deleted keys -> exactly one tombstone with the old attrs
      (s1.keySet -- s2.keySet).foreach { k =>
        val tombs = hist.filter(v => v._1 == k && v._5 == 1L)
        assert(tombs.length == 1 && tombs.head._2 == s1(k),
          s"trial $trial key $k: tombstone")
      }
    }
  }
}
