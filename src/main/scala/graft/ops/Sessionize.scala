package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event sequence wherever
  * the gap to the previous event exceeds `gapMinutes`, then aggregate
  * per session. The classic clickstream/training-log operator.
  *
  * One shuffle on the key; the boundary flag, running session index,
  * and per-session aggregation all ride the same partitioning.
  */
object Sessionize {

  def sessions(events: DataFrame, key: String, tsUs: String,
               valueCents: String, gapMinutes: Long = 30): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsUs))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(col(tsUs), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col(tsUs) - col("prev_us") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(run))
      .groupBy(col(key), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUs)).as("start_us"),
        max(col(tsUs)).as("end_us"),
        sum(col(valueCents)).as("sum_cents"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
