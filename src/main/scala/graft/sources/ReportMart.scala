package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Report-mart sink, the analog of the reference's REP_FRAUD insert +
  * `tools.show_data` display (tools.py:5-13). Parquet, partitioned by
  * the rule tag so per-rule reads prune to one directory — at 100 TB a
  * mart readers filter by rule far more often than they full-scan.
  */
object ReportMart {

  def append(mart: DataFrame, path: String): Unit =
    mart.write.mode("append").partitionBy("rule").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Console display (dev-scale only; never collect a mart at scale). */
  def show(mart: DataFrame, n: Int = 20): Unit = mart.show(n, truncate = false)
}
