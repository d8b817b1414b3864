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

  /** B11 — one-pass column profile: per column, the row count, null
    * count, exact distinct count, and min/max (cast to string AFTER the
    * native-type comparison, so numeric/date ordering is preserved and
    * the tall schema stays uniform). The whole profile is ONE
    * aggregation — Spark plans the multiple exact distincts with a
    * single Expand (rows × #columns), the standard exact-profile cost;
    * swap countDistinct for approx_count_distinct when a 100 TB profile
    * can tolerate estimates. The scalar result row explodes into the
    * tall frame driver-free.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__dist"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__dist").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
