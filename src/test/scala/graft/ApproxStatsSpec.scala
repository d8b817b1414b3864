package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Accuracy contract for the D12 sketch aggregations. Since r6 the query
  * itself emits (exact answer, within-band verdict flag) per sketch —
  * that is what the DuckDB oracle hashes. This spec pins the semantics
  * behind those flags: the exact columns really are the exact answers,
  * and every verdict flag fires green on the test corpus (i.e. the
  * sketches actually sit inside their documented error bands).
  */
class ApproxStatsSpec extends SparkSpec {

  test("exact columns match independent exact aggregation; all bands green") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = SparkEntry.queries("q_approx_stats")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val flag = r.getString(0)
      val (nd, p50, p95) = exact(flag)
      assert(r.getLong(1) == nd, s"$flag: exact_parts ${r.getLong(1)} != $nd")
      assert(r.getDouble(2) == p50, s"$flag: p50_exact ${r.getDouble(2)} != $p50")
      assert(r.getDouble(3) == p95, s"$flag: p95_exact ${r.getDouble(3)} != $p95")
      assert(r.getLong(4) == 1L, s"$flag: HLL outside its 10% (5-sigma) band")
      assert(r.getLong(5) == 1L, s"$flag: p50 sketch outside its 2% band")
      assert(r.getLong(6) == 1L, s"$flag: p95 sketch outside its 2% band")
    }
  }
}
