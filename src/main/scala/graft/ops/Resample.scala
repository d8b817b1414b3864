package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling / gap filling (D23): regularize an irregular
  * keyed event stream onto a fixed grid, carrying the last observed
  * value forward (LOCF).
  *
  * Shape: per-key grid generation (`sequence` over the key's bucketed
  * [min, max] span) + the same union-and-running-`last` composition as
  * [[AsOfJoin]] — one shuffle on the key, O(grid+events) per key after
  * the sort, no non-equi join anywhere. Events landing on the same
  * (key, ts) are pre-aggregated so the carried value is deterministic.
  * The DuckDB oracle cross-checks with generate-series + native ASOF.
  *
  * 100 TB posture: grid size is bounded by span/step per key (explicit,
  * predictable blow-up — callers pick `stepUs` accordingly); everything
  * else is one hash shuffle on the key and a single window pass.
  */
object Resample {

  /** One row per (key, grid point): `v_cents` = last observation at or
    * before the grid point within the key (null → no prior observation,
    * emitted as -1 with `has_value` = 0). */
  def lastValueGrid(events: DataFrame, key: String, tsUs: String,
                    valueCents: String, stepUs: Long): DataFrame = {
    // deterministic value per (key, ts): max of simultaneous events
    val obs = events
      .groupBy(col(key), col(tsUs))
      .agg(max(col(valueCents)).as("v"))

    // bounds from the RAW events (min/max are dedup-invariant): this
    // branch's shuffle carries only map-side-combined (key, min, max)
    // rows, so the heavy (key, ts) shuffle happens once, in `obs`.
    val grid = events
      .groupBy(col(key))
      .agg(min(col(tsUs)).as("tmin"), max(col(tsUs)).as("tmax"))
      .select(col(key), explode(sequence(
        expr(s"tmin div ${stepUs}L * ${stepUs}L"),
        expr(s"tmax div ${stepUs}L * ${stepUs}L"),
        lit(stepUs))).as("grid_us"))

    // union: observations first at equal timestamps (ASOF's inclusive >=)
    val tagged = obs
      .select(col(key), col(tsUs).as("t"), lit(0).as("is_grid"), col("v"))
      .unionByName(grid
        .select(col(key), col("grid_us").as("t"), lit(1).as("is_grid"),
          lit(null).cast("long").as("v")))
    val w = Window.partitionBy(col(key))
      .orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole observation (struct is non-null for every obs row,
    // even when its value is null): the nearest prior observation wins,
    // and a null-valued observation yields null — exactly ASOF-join
    // semantics. A bare last(v, ignoreNulls) would instead skip past a
    // null observation to an older non-null one.
    tagged
      .withColumn("last_obs",
        last(when(col("is_grid") === 0, struct(col("t"), col("v"))),
          ignoreNulls = true).over(w))
      .withColumn("filled", col("last_obs.v"))
      .filter(col("is_grid") === 1)
      .select(
        col(key), col("t").as("grid_us"),
        coalesce(col("filled"), lit(-1L)).as("v_cents"),
        when(col("filled").isNotNull, 1L).otherwise(0L).as("has_value"))
      .orderBy(col(key), col("grid_us"))
  }

  /** D35 — LINEAR interpolation onto the same fixed grid: each grid
    * point takes v_prev + (v_next−v_prev)·(g−t_prev)/(t_next−t_prev)
    * between its bracketing observations, the nearest value beyond the
    * observed range, −1 for keys with no observations at all. The
    * bracketing pair comes from TWO running-`last` windows over the same
    * tagged union — identical hash partitioning on the key, so Catalyst
    * plans ONE exchange with two in-partition sorts (ascending and
    * descending), never a non-equi join. Differences and products are
    * exact BIGINT; the interpolation is a fixed sequence of IEEE ops
    * mirrored verbatim by the DuckDB double-ASOF oracle. */
  def interpolatedGrid(events: DataFrame, key: String, tsUs: String,
                       valueCents: String, stepUs: Long): DataFrame = {
    val obs = events
      .groupBy(col(key), col(tsUs))
      .agg(max(col(valueCents)).as("v"))
    val grid = events
      .groupBy(col(key))
      .agg(min(col(tsUs)).as("tmin"), max(col(tsUs)).as("tmax"))
      .select(col(key), explode(sequence(
        expr(s"tmin div ${stepUs}L * ${stepUs}L"),
        expr(s"tmax div ${stepUs}L * ${stepUs}L"),
        lit(stepUs))).as("grid_us"))
    val tagged = obs
      .select(col(key), col(tsUs).as("t"), lit(0).as("is_grid"), col("v"))
      .unionByName(grid
        .select(col(key), col("grid_us").as("t"), lit(1).as("is_grid"),
          lit(null).cast("long").as("v")))
    // observations sort before grid points at equal t in BOTH directions,
    // so a co-timed observation is its own bracket on either side
    val wPrev = Window.partitionBy(col(key))
      .orderBy(col("t").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key))
      .orderBy(col("t").desc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsStruct = when(col("is_grid") === 0, struct(col("t"), col("v")))
    tagged
      .withColumn("p", last(obsStruct, ignoreNulls = true).over(wPrev))
      .withColumn("n", last(obsStruct, ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .select(col(key), col("t").as("grid_us"),
        when(col("p").isNull && col("n").isNull, lit(-1d))
          .when(col("p").isNull, col("n.v").cast("double"))
          .when(col("n").isNull, col("p.v").cast("double"))
          .when(col("n.t") === col("p.t"), col("p.v").cast("double"))
          .otherwise(
            ((col("n.v") - col("p.v")) * (col("t") - col("p.t"))).cast("double")
              / (col("n.t") - col("p.t")) + col("p.v"))
          .as("v_interp"))
      .orderBy(col(key), col("grid_us"))
  }
}
