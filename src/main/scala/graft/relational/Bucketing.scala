package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support for co-located joins (SURVEY.md §6).
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle. Land
  * both facts bucketed (and sorted) by the join key and Spark's planner
  * proves the partitioning requirement from the bucket spec instead of
  * inserting an Exchange — the join runs entirely map-side, file-local.
  */
object Bucketing {

  /** Land `df` as a bucketed, bucket-sorted managed table. Drops any
    * prior table AND its leftover warehouse directory first — a dead
    * location from a previous session otherwise fails the create with
    * LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key. With matching
    * bucket counts the plan contains no shuffle on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True if the executed plan contains any shuffle exchange — the
    * assertion hook for co-location tests. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
}
