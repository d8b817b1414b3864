package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous file-drop ingestion (SURVEY.md §2 F4): the reference's
  * daily `data/` directory polled by main.py becomes a streaming file
  * source — new `;`-CSV drops are picked up incrementally (exactly-once
  * per file via the source's file tracking) and appended to a
  * date-partitioned parquet lake.
  */
object StreamingIngest {

  /** Stream of staged rows from a drop directory. */
  def dropStream(spark: SparkSession, dropDir: String,
                 schema: StructType, sep: String = ";"): DataFrame =
    spark.readStream
      .option("sep", sep)
      .option("header", "true")
      .schema(schema)
      .csv(dropDir)

  /** Land a transaction stream into a date-partitioned parquet lake —
    * partitioning by event date makes every date-ranged read prune at
    * the directory level (the 100 TB access path). */
  def landPartitioned(txns: DataFrame, dateCol: String, lakePath: String,
                      checkpoint: String): StreamingQuery =
    txns
      .withColumn("p_date", date_format(col(dateCol), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .option("path", lakePath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("p_date")
      .trigger(Trigger.AvailableNow())
      .start()
}
