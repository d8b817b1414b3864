package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZValue

/** Z-order (Morton-curve) data layout (SURVEY.md §2 I11/D34).
  *
  * At 100 TB the scan is the cost, and the only defense is file
  * skipping on min/max statistics. A sort on one column gives tight
  * stats for that column alone; clustering on the interleaved z-value
  * gives bounded spans on BOTH dimensions in every partition, so scans
  * filtered on either dimension prune most files. This is layout-time
  * work: one range exchange + in-partition sort, no new shuffle shape.
  */
object ZOrder {

  /** `df` clustered for writing: range-partitioned and sorted by the
    * z-value of the two (non-negative, `bits`-bit) dimension columns. */
  def layout(df: DataFrame, dim1: String, dim2: String,
             bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val z = ZValue.zValueL(col(dim1), col(dim2), bits)
    df.withColumn("_z", z)
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** I22 — total-order layout on ONE key: the degenerate-but-common
    * sibling of [[layout]]. `repartitionByRange` samples the key to
    * build quantile cut points (one pass + one range exchange — never
    * a global sort through one reducer) and the in-partition sort
    * makes every written file carry a NON-OVERLAPPING min/max range,
    * so a key-range scan prunes to the few files that intersect it.
    * Equal keys hash to one partition, so ranges may touch at the
    * boundaries but never interleave. This is the layout for the
    * "always filtered by time" fact table; z-order when TWO dimensions
    * matter. */
  def rangeLayout(df: DataFrame, key: String,
                  numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(n, col(key)).sortWithinPartitions(col(key))
  }

  /** Per-z-range clustering statistics over the events grid (the
    * oracle-checked shape): bucket the z-curve and report each bucket's
    * row count and dimension spans — tight spans on both dimensions are
    * exactly what makes the layout prunable. */
  def zStats(events: DataFrame, bits: Int = 10,
             bucketShift: Int = 10): DataFrame = {
    val d1 = expr(s"user_id % ${1L << bits}L")
    val d2 = expr(s"(ts_us div 3600000000) % ${1L << bits}L")
    events
      .select(d1.as("d1"), d2.as("d2"))
      .withColumn("z", ZValue.zValueL(col("d1"), col("d2"), bits))
      .groupBy(expr(s"z div ${1L << bucketShift}L").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("d1")).as("d1_min"), max(col("d1")).as("d1_max"),
        min(col("d2")).as("d2_min"), max(col("d2")).as("d2_max"))
      .orderBy(col("z_bucket"))
  }
}
