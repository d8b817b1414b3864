package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Accuracy contract for the D12 sketch aggregations. The driver's gate
  * can only rows-check q_approx_stats (sketches differ across engines by
  * design), so this spec pins the sketches to the EXACT answers computed
  * on the same data: that is the strongest cross-checkable property.
  */
class ApproxStatsSpec extends SparkSpec {

  test("approx_count_distinct within 3*rsd of exact; quantiles bracket exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = SparkEntry.queries("q_approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (nd, p50, p95)) =>
      val (ndExact, p50Exact, lo, hi) = exact(flag)
      val rel = math.abs(nd - ndExact).toDouble / ndExact
      assert(rel <= 0.06, s"$flag: approx nd $nd vs exact $ndExact (rel $rel)")
      // percentile_approx with accuracy 10000 on ~20k rows per group is
      // near-exact; require it within 1% of the exact median and inside
      // the data range, and the two quantiles ordered.
      assert(math.abs(p50 - p50Exact) / p50Exact <= 0.01,
        s"$flag: p50 $p50 vs exact $p50Exact")
      assert(p50 >= lo && p95 <= hi && p50 <= p95)
    }
  }
}
