package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B14 — incremental aggregate maintenance: the daily-pipeline pattern
  * where a per-key aggregate table is kept current by MERGING each new
  * batch's partial state instead of rescanning history. The state tuple
  * (n, sum, min, max) is chosen to be associative-mergeable — the same
  * algebra Spark's own partial aggregation uses, lifted to the
  * TABLE level so "yesterday's state + today's delta" is one
  * state-sized union + re-aggregation. At 100 TB the history is never
  * read again: the merge cost is O(|state| + |delta|), and the oracle
  * (a full recompute over all rows) proves incremental ≡ full.
  * Averages and other derived measures come off the state at read
  * time (one IEEE division — deterministic), never stored.
  */
object IncrementalAgg {

  /** Partial state of one batch (or the running state of many). */
  def state(df: DataFrame, key: String, valueCents: Column): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      sum(valueCents).as("sum_cents"),
      min(valueCents).as("min_cents"),
      max(valueCents).as("max_cents"))

  /** Associative merge of two states (union + re-aggregate on the
    * mergeable algebra: counts and sums add, min/max fold). */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(col(key)).agg(
      sum(col("n")).as("n"),
      sum(col("sum_cents")).as("sum_cents"),
      min(col("min_cents")).as("min_cents"),
      max(col("max_cents")).as("max_cents"))
}
