package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key and time ≤ the left row's time.
  *
  * Spark has no native as-of operator. Preference order from the build
  * guide: compose built-ins when semantics allow — and they do: tag the
  * two inputs, union them, and take `last(right_time) ignoring nulls`
  * over a (key, time)-ordered running window, then keep left rows. One
  * shuffle on the key, no range-join explosion, and — unlike a naive
  * non-equi join — no O(n·m) per-key pair scan: the window pass is
  * O(n+m) per key after the sort, exactly how a distributed as-of should
  * scale. The DuckDB oracle cross-checks with its native ASOF JOIN.
  */
object AsOfJoin {

  /** Generic form over one keyed event table: for every `queryType` row,
    * attach the timestamp of the last `refType` row at or before it
    * (ties resolve ref-first, matching ASOF's inclusive `>=`). */
  def lastPriorEvent(events: DataFrame, key: String, timeCol: String,
                     idCol: String, typeCol: String,
                     queryType: String, refType: String): DataFrame = {
    val refFirst = when(col(typeCol) === refType, 0).otherwise(1)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), refFirst)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(typeCol).isin(queryType, refType))
      .select(col(idCol), col(key), col(timeCol), col(typeCol))
      .withColumn("ref_ts", when(col(typeCol) === refType, col(timeCol)))
      .withColumn("asof_ts", last(col("ref_ts"), ignoreNulls = true).over(w))
      .filter(col(typeCol) === queryType)
      .select(
        col(idCol), col(key), col(timeCol),
        coalesce(col("asof_ts"), lit(-1L)).as("asof_ts"),
        coalesce(col(timeCol) - col("asof_ts"), lit(-1L)).as("gap"))
  }

  /** [[lastPriorEvent]] with a staleness bound — the guard every
    * production point-in-time join needs (a reference row `maxGap`
    * time units stale is usually worse than none): matches farther
    * back than `maxGap` become no-match (-1/-1), exactly as if the
    * reference row were absent. A projection over the tolerance-free
    * result — the window pass, its one shuffle, and its plan are
    * untouched. */
  def lastPriorEventWithin(events: DataFrame, key: String, timeCol: String,
                           idCol: String, typeCol: String,
                           queryType: String, refType: String,
                           maxGap: Long): DataFrame = {
    val hit = col("gap").between(0L, maxGap)
    lastPriorEvent(events, key, timeCol, idCol, typeCol, queryType, refType)
      .select(col(idCol), col(key), col(timeCol),
        when(hit, col("asof_ts")).otherwise(lit(-1L)).as("asof_ts"),
        when(hit, col("gap")).otherwise(lit(-1L)).as("gap"))
  }

  /** [[lastPriorEvent]] through the NATIVE as-of operator
    * ([[graft.plans.AsOfJoinExec]]) instead of the union+window
    * composition — same output contract, same DuckDB `ASOF LEFT JOIN`
    * oracle, so the custom exec is held to the exact semantics of the
    * built-in path. Right side aliased (self-join attribute hygiene). */
  def lastPriorEventNative(events: DataFrame, key: String, timeCol: String,
                           idCol: String, typeCol: String,
                           queryType: String, refType: String): DataFrame = {
    val q = events.filter(col(typeCol) === queryType)
      .select(col(idCol), col(key), col(timeCol))
    val r = events.filter(col(typeCol) === refType)
      .select(col(key).as("ref_key"), col(timeCol).as("ref_ts"))
    graft.plans.AsOfNative
      .join(q, r, Seq(q(key)), Seq(r("ref_key")), q(timeCol), r("ref_ts"))
      .select(
        col(idCol), col(key), col(timeCol),
        coalesce(col("ref_ts"), lit(-1L)).as("asof_ts"),
        coalesce(col(timeCol) - col("ref_ts"), lit(-1L)).as("gap"))
  }
}
