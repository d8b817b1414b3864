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

  /** D79 — session CONCURRENCY curve by sweep-line: per day the peak
    * number of simultaneously-open sessions and the session-start
    * count — the capacity-planning read (peak concurrent users sizes
    * connection pools and state stores; D17 counts sessions, this
    * counts their OVERLAP). Classic interval stabbing: +1 at each
    * session start, −1 at each end, one global running sum ordered by
    * (ts, +1-before-−1) — the tie order makes intervals CLOSED (a
    * session ending exactly when another starts overlaps it for an
    * instant, and a single-event session still counts while it lives).
    * The carry-in plateau is captured without a calendar grid:
    * `greatest(open, open − d)` at any row is the concurrency just
    * before it, so a day whose first delta is an end still reports the
    * level it inherited overnight. Within a run of identical (ts, d)
    * rows the per-row prefix values permute but their MULTISET is
    * fixed, so the per-day max is engine-order-invariant — the only
    * reason the output hashes despite a non-total sort key.
    *
    * Scale: sessions are a contraction of events (D17's output, ~one
    * row per user-visit); the sweep's global window runs over THAT
    * frame — the H4 distinct-contraction posture, not an event sort.
    * Days with no session boundary are absent (concurrency there is
    * flat and readable off the neighbors). */
  def concurrencyCurve(sess: DataFrame): DataFrame = {
    val deltas = sess
      .select(col("start_us").as("ts"), lit(1L).as("d"))
      .unionByName(sess.select(col("end_us").as("ts"), lit(-1L).as("d")))
    val w = Window.orderBy(col("ts"), col("d").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("open", sum(col("d")).over(w))
      .groupBy(expr("ts div 86400000000").as("day"))
      .agg(max(greatest(col("open"), col("open") - col("d")))
          .as("peak_concurrent"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"))
      .orderBy(col("day"))
  }
}
