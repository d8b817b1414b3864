package graft

import org.apache.spark.sql.functions._

import graft.etl.Checks
import graft.etl.Checks._
import graft.sources.Tables

/** B29 — the declarative check suite on a hand case with known
  * violation counts for every check type, budgets included. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("all six check types count violations exactly; budgets gate pass") {
    val df = Seq(
      (1L, Some("a"), 10L, "X"),
      (2L, Some("b"), 99L, "Y"), // bounds violation (>50)
      (2L, Some("c"), 20L, "X"), // duplicate key 2
      (3L, None, 30L, "Z"),      // null name + domain violation (Z)
      (9L, Some("d"), -5L, "X")) // bounds violation (<0) + orphan key 9
      .toDF("k", "name", "v", "tag")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = Checks.run(df, Seq(
      NotNull("n1_name", "name"),
      Bounds("n2_v", col("v"), 0L, 50L),
      Accepted("n3_tag", "tag", Seq("X", "Y")),
      Unique("n4_key", Seq("k")),
      Referential("n5_fk", "k", ref, "rk"),
      Predicate("n6_pos", col("v") > 0L, allowed = 1L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "n1_name" -> ((1L, 0L, 0L)),
      "n2_v" -> ((2L, 0L, 0L)),
      "n3_tag" -> ((1L, 0L, 0L)),
      "n4_key" -> ((1L, 0L, 0L)),
      "n5_fk" -> ((1L, 0L, 0L)),
      "n6_pos" -> ((1L, 1L, 1L)))) // 1 violation, budget 1 → pass
  }

  test("row-local checks fuse into one aggregate over one scan") {
    val df = Tables.lineitem(spark, sf)
    val plan = Checks.run(df, Seq(
      NotNull("a", "l_returnflag"),
      Bounds("b", col("l_linenumber").cast("long"), 0L, 10L),
      Predicate("c", col("l_quantity") > 0)))
      .queryExecution.optimizedPlan
    // exactly one non-local leaf (the lineitem scan) feeds all three
    // metrics; the only other leaf is the tiny budgets LocalRelation
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode
        if !l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation] => l
    }
    assert(scans.size == 1, s"expected 1 file scan, got ${scans.size}: $scans")
  }
}
