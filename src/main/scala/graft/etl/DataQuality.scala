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
}
