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

  /** F6 — continuous fraud scoring: every micro-batch of staged
    * transactions runs the stateless rules (passport/account expiry)
    * and appends hits to the mart. The windowed rules ride
    * [[StreamingOps.guessingAmountStream]]'s keyed state instead — a
    * per-batch window would miss cross-batch patterns. */
  def continuousFraudMart(txns: DataFrame, clients: DataFrame,
                          accounts: DataFrame, batchDate: String,
                          martPath: String, checkpoint: String): StreamingQuery =
    txns.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val mart = graft.fraud.FraudRules.mart(Seq(
          graft.fraud.FraudRules.passportFraud(
            clients, clients.filter(col("blacklisted") === 1L)
              .select(col("c_custkey")), batch.toDF(), batchDate),
          graft.fraud.FraudRules.accountFraud(
            accounts, clients, batch.toDF(), batchDate)))
        graft.sources.ReportMart.append(mart, martPath)
      }
      .start()

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
