package graft

import org.apache.spark.sql.functions._

import graft.ops.Survival

/** Hand-computed Kaplan–Meier semantics (the oracle twin proves
  * Spark↔DuckDB parity; these pin the MATH and the censoring rules). */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L
  private def odf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("o_orderkey", "o_orderpriority", "d")
      .select(col("o_orderkey"), col("o_orderpriority"),
        timestamp_micros(col("d") * day).as("o_orderdate"))
  private def ldf(rows: Seq[(Long, Long)]) =
    rows.toDF("l_orderkey", "d")
      .select(col("l_orderkey"), timestamp_micros(col("d") * day).as("l_shipdate"))

  test("D67: interleaved censoring shrinks risk sets between deaths") {
    // cutoff = max ship (50) − 30 = 20. Deaths at lag 2 (o1) and lag 5
    // (o3, ordered d15 shipped d20); o2 (shipped d50) censored at
    // t = 20; o4 (ordered d17, shipped d45) censored at t = 3 — BETWEEN
    // the deaths, so the lag-5 risk set is 2, not 3.
    // KM: S(2) = 3/4 = 750000 ppm; S(5) = 750000·(2−1)/2 = 375000 ppm.
    val orders = odf(Seq((1L, "A", 0L), (2L, "A", 0L), (3L, "A", 15L),
      (4L, "A", 17L)))
    val items = ldf(Seq((1L, 2L), (2L, 50L), (3L, 20L), (4L, 45L)))
    val out = Survival.kaplanMeier(orders, items).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      2L -> (1L, 0L, 4L, 750000L),
      5L -> (1L, 0L, 2L, 375000L)))
  }

  test("D67: with censoring only at the common horizon, KM telescopes") {
    // all orders placed day 0, one item each: lags 1,2,3 shipped; one
    // censored at the horizon. The product telescopes to survivors/total
    // at every death time: S = 3/4, 2/4, 1/4.
    val orders = odf(Seq((1L, "B", 0L), (2L, "B", 0L), (3L, "B", 0L),
      (4L, "B", 0L)))
    val items = ldf(Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 33L)))
    val out = Survival.kaplanMeier(orders, items).collect()
      .map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(out == Map(1L -> 750000L, 2L -> 500000L, 3L -> 250000L))
  }

  test("D67: same-day deaths batch into one step; orders past cutoff drop") {
    // two deaths at lag 2 in one step: S(2) = (4−2)/4 = 500000; the
    // order placed after the cutoff (d25 > 20) must not enter at all.
    val orders = odf(Seq((1L, "C", 0L), (2L, "C", 0L), (3L, "C", 0L),
      (4L, "C", 0L), (5L, "C", 25L)))
    val items = ldf(Seq((1L, 2L), (2L, 2L), (3L, 9L), (4L, 50L), (5L, 26L)))
    val out = Survival.kaplanMeier(orders, items).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((2L, 2L, 4L, 500000L), (9L, 1L, 2L, 250000L)))
  }
}
