package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B22 — dictionary encoding: value → dense id ∈ [0, |domain|), the
  * lake-side sibling of parquet's page-level dictionaries and the
  * prerequisite for every dense-domain technique downstream (D58's
  * bitset distinct, bitmap indexes, array-indexed aggregation).
  *
  * Determinism: ids are assigned by VALUE ORDER (row_number over the
  * sorted distinct domain), not by arrival order — so the dictionary
  * is a pure function of the value set, reproducible across engines,
  * runs, and partitionings (zipWithIndex would be none of those).
  *
  * Scale: the only ordered work is a window over the DISTINCT domain
  * (domain-sized, not corpus-sized — the usual contraction argument;
  * domains big enough to break a single-partition sort should range-
  * partition the window or switch to hash ids). Encoding joins the
  * dictionary back — broadcast when the domain is small, shuffle-on-
  * value otherwise, Catalyst's call.
  */
object Dictionary {

  /** The (value, id) dictionary for one string column. */
  def build(df: DataFrame, valueCol: String): DataFrame = {
    val w = Window.orderBy(col("value"))
    df.select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .distinct()
      .withColumn("id", (row_number().over(w) - 1).cast("long"))
  }

  /** Replace `valueCol` with its dense id (`valueCol`_id); NULLs map
    * to NULL id, preserving SQL semantics. */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame =
    df.join(dict.select(col("value").as(valueCol), col("id")
        .as(s"${valueCol}_id")), Seq(valueCol), "left")
      .drop(valueCol)
}
