package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.FraudEtlPipeline
import graft.streaming.StreamingIngest

/** F4 — continuous file-drop ingestion into a date-partitioned lake,
  * with partition pruning proven in-plan on readback. */
class StreamingIngestSpec extends SparkSpec {

  test("continuous fraud mart: micro-batches run rules and append hits") {
    val root = Files.createTempDirectory("graft_stream_fraud")
    val drop = Files.createDirectory(root.resolve("drop")).toString
    val mart = root.resolve("mart").toString
    Files.writeString(java.nio.file.Paths.get(drop, "transactions_01032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |1;2021-03-01 10:00:00;10.00;1;PAYMENT;SUCCESS;T1
        |2;2021-03-01 11:00:00;20.00;2;PAYMENT;SUCCESS;T1
        |""".stripMargin)
    import spark.implicits._
    val clients = Seq(
      (1L, "IVANOV IVAN", "0001 000001", "+7000000001", "VIP",
        java.sql.Date.valueOf("2021-01-01"), 0L),
      (2L, "PETROV PETR", "0002 000002", "+7000000002", "STD",
        java.sql.Date.valueOf("2025-01-01"), 0L))
      .toDF("c_custkey", "fio", "passport_num", "phone", "segment",
        "passport_valid_to", "blacklisted")
    val accounts = Seq((2L, java.sql.Date.valueOf("2020-06-01")))
      .toDF("client", "valid_to")
    val stream = StreamingIngest
      .dropStream(spark, drop, FraudEtlPipeline.txnSchema)
      .select(
        col("transaction_id").as("event_id"),
        col("card_num").as("user_id"),
        unix_micros(col("transaction_date")).as("ts_us"),
        (col("amount") * 100).cast("long").as("amt_cents"),
        col("oper_type").as("event_type"), col("oper_result"))
    val q = StreamingIngest.continuousFraudMart(stream, clients, accounts,
      "2021-03-01", mart, root.resolve("ckpt").toString)
    q.awaitTermination()
    val hits = spark.read.parquet(mart)
    // client 1 expired passport; client 2 expired account
    assert(hits.filter(col("rule") === "passport_fraud")
      .select("client_key").as[Long].collect().toSet == Set(1L))
    assert(hits.filter(col("rule") === "account_fraud")
      .select("client_key").as[Long].collect().toSet == Set(2L))
  }

  test("replayed micro-batch converges: the mart never double-appends (F6+B15)") {
    val root = Files.createTempDirectory("graft_stream_replay")
    val drop = Files.createDirectory(root.resolve("drop")).toString
    val mart = root.resolve("mart").toString
    Files.writeString(java.nio.file.Paths.get(drop, "transactions_01032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |1;2021-03-01 10:00:00;10.00;1;PAYMENT;SUCCESS;T1
        |2;2021-03-01 11:00:00;20.00;2;PAYMENT;SUCCESS;T1
        |""".stripMargin)
    import spark.implicits._
    val clients = Seq(
      (1L, "IVANOV IVAN", "0001 000001", "+7000000001", "VIP",
        java.sql.Date.valueOf("2021-01-01"), 0L),
      (2L, "PETROV PETR", "0002 000002", "+7000000002", "STD",
        java.sql.Date.valueOf("2025-01-01"), 0L))
      .toDF("c_custkey", "fio", "passport_num", "phone", "segment",
        "passport_valid_to", "blacklisted")
    val accounts = Seq((2L, java.sql.Date.valueOf("2020-06-01")))
      .toDF("client", "valid_to")
    def run(ckpt: String): Unit = {
      val stream = StreamingIngest
        .dropStream(spark, drop, FraudEtlPipeline.txnSchema)
        .select(
          col("transaction_id").as("event_id"),
          col("card_num").as("user_id"),
          unix_micros(col("transaction_date")).as("ts_us"),
          (col("amount") * 100).cast("long").as("amt_cents"),
          col("oper_type").as("event_type"), col("oper_result"))
      StreamingIngest.continuousFraudMart(stream, clients, accounts,
        "2021-03-01", mart, ckpt).awaitTermination()
    }
    run(root.resolve("ckpt").toString)
    val first = spark.read.parquet(mart).drop("batch_id").collect().toSeq
    assert(first.nonEmpty)
    // kill-and-replay: a fresh checkpoint re-delivers the same files as
    // micro-batch 0 — the worst-case at-least-once replay. The
    // batch-id-keyed dynamic overwrite must rewrite, not append.
    run(root.resolve("ckpt_replay").toString)
    val replayed = spark.read.parquet(mart).drop("batch_id").collect().toSeq
    assert(replayed.groupBy(identity).view.mapValues(_.size).toMap ==
      first.groupBy(identity).view.mapValues(_.size).toMap,
      s"mart diverged after replay: ${first.size} -> ${replayed.size} rows")
  }

  test("csv drops land partitioned; second drop is incremental; reads prune") {
    val root = Files.createTempDirectory("graft_stream_ingest")
    val drop = Files.createDirectory(root.resolve("drop")).toString
    val lake = root.resolve("lake").toString
    val ckpt = root.resolve("ckpt").toString

    Files.writeString(java.nio.file.Paths.get(drop, "transactions_01032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |1;2021-03-01 10:00:00;10.00;1;PAYMENT;SUCCESS;T1
        |2;2021-03-01 11:00:00;20.00;2;PAYMENT;SUCCESS;T1
        |""".stripMargin)

    val stream = StreamingIngest.dropStream(spark, drop, FraudEtlPipeline.txnSchema)
    val q1 = StreamingIngest.landPartitioned(stream, "transaction_date", lake, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(lake).count() == 2)

    // a later drop is picked up incrementally (old file not re-read)
    Files.writeString(java.nio.file.Paths.get(drop, "transactions_02032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |3;2021-03-02 09:00:00;30.00;3;WITHDRAW;REJECT;T2
        |""".stripMargin)
    val q2 = StreamingIngest.landPartitioned(
      StreamingIngest.dropStream(spark, drop, FraudEtlPipeline.txnSchema),
      "transaction_date", lake, ckpt)
    q2.awaitTermination()
    val all = spark.read.parquet(lake)
    assert(all.count() == 3)

    // date filter prunes to one partition directory
    val pruned = all.filter(col("p_date") === "2021-03-02")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("p_date"), "expected partition filter in scan")
  }
}
