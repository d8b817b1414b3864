package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over a DWH — the guardrails a daily
  * pipeline like the reference's needs before publishing a mart:
  * orphaned foreign keys, duplicate business keys, null/blank rates.
  * Each check is one aggregate or anti-join; results land in a single
  * tall (check, violations) frame a scheduler can alert on.
  */
object DataQuality {

  /** Rows in `fact` whose `fk` has no match in `dim.pk` (anti join). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame =
    fact.join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")

  /** Business keys appearing more than once. */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** Tall summary: one row per check with its violation count. */
  def summary(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, df) =>
      df.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    }.reduce(_ unionByName _)

  /** B11 — column profile: per column, the row count, null count,
    * exact distinct count, and min/max (cast to string AFTER the
    * native-type comparison, so numeric/date ordering is preserved and
    * the tall schema stays uniform).
    *
    * Shape: one SINGLE-COLUMN pass per column, unioned. Packing all
    * columns into one aggregation looks cheaper but plans the multiple
    * exact distincts as an Expand (rows × #columns through one
    * shuffle) — measured 17 s vs 3 s at 10× on five order columns.
    * Per-column passes instead let the parquet scan prune to exactly
    * one column each and plan each countDistinct as a no-Expand
    * two-phase aggregate; the union's branches run as independent
    * stages. Swap countDistinct for approx_count_distinct when a
    * 100 TB profile can tolerate estimates.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)
      .orderBy(col("col_name"))
}
