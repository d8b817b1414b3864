package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.etl.FraudEtlPipeline
import graft.etl.FraudEtlPipeline.Layout

/** End-to-end daily-batch orchestration (main.py analog): two days of
  * file drops through ingest → SCD2 → rules → mart → archive. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeDay1(drop: Path): Unit = {
    Files.writeString(drop.resolve("transactions_01032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |1;2021-03-01 10:00:00;100.00;1;PAYMENT;SUCCESS;T1
        |2;2021-03-01 10:05:00;50.00;3;PAYMENT;SUCCESS;T2
        |3;2021-03-01 11:00:00;70.00;4;PAYMENT;SUCCESS;T1
        |4;2021-03-01 11:30:00;20.00;4;PAYMENT;SUCCESS;T2
        |""".stripMargin)
    Files.writeString(drop.resolve("passport_blacklist_01032021.csv"),
      "date;passport\n2021-03-01;3\n")
    Files.writeString(drop.resolve("terminals_01032021.csv"),
      """terminal_id;terminal_type;terminal_city;terminal_address
        |T1;ATM;Moscow;Lenina 1
        |T2;POS;Oslo;Karl Johans 2
        |""".stripMargin)
  }

  private def writeDay2(drop: Path): Unit = {
    Files.writeString(drop.resolve("transactions_02032021.txt"),
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |10;2021-03-02 09:00:00;50.00;2;WITHDRAW;REJECT;T1
        |11;2021-03-02 09:05:00;40.00;2;WITHDRAW;REJECT;T1
        |12;2021-03-02 09:10:00;30.00;2;WITHDRAW;REJECT;T1
        |13;2021-03-02 09:15:00;20.00;2;WITHDRAW;SUCCESS;T1
        |""".stripMargin)
    Files.writeString(drop.resolve("passport_blacklist_02032021.csv"),
      "date;passport\n")
    Files.writeString(drop.resolve("terminals_02032021.csv"),
      """terminal_id;terminal_type;terminal_city;terminal_address
        |T1;ATM;Riga;Brivibas 9
        |T3;POS;Bern;Bahnhof 3
        |""".stripMargin)
  }

  test("two daily runs: SCD2 versions, rule hits, mart append, archive") {
    val root = Files.createTempDirectory("graft_pipeline")
    val drop = Files.createDirectory(root.resolve("drop"))
    val layout = Layout(drop.toString, root.resolve("archive").toString,
      root.resolve("terminals_hist").toString, root.resolve("mart").toString)

    val clients = Seq(
      (1L, "IVANOV IVAN", "0001 000001", "+7000000001", "VIP",
        java.sql.Date.valueOf("2021-01-01")),
      (2L, "PETROV PETR", "0002 000002", "+7000000002", "STD",
        java.sql.Date.valueOf("2025-01-01")),
      (3L, "SIDOROV SID", "0003 000003", "+7000000003", "STD",
        java.sql.Date.valueOf("2025-01-01")),
      (4L, "KOTOV KOT", "0004 000004", "+7000000004", "VIP",
        java.sql.Date.valueOf("2025-01-01")))
      .toDF("c_custkey", "fio", "passport_num", "phone", "segment",
        "passport_valid_to")
    val accounts = Seq((2L, java.sql.Date.valueOf("2020-06-01")))
      .toDF("client", "valid_to")

    writeDay1(drop)
    assert(FraudEtlPipeline.runDaily(spark, layout, clients, accounts)
      .contains("2021-03-01"))

    val hist1 = spark.read.parquet(layout.historyPath)
    assert(hist1.count() == 2) // T1, T2 initialized
    val mart1 = spark.read.parquet(layout.martPath)
    // client 1: expired passport; client 3: blacklisted
    val flagged1 = mart1.filter(col("rule") === "passport_fraud")
      .select("client_key").as[Long].collect().toSet
    assert(flagged1 == Set(1L, 3L))
    // client 4: Moscow 11:00 -> Oslo 11:30 within an hour
    assert(mart1.filter(col("rule") === "city_fraud")
      .select("client_key").as[Long].collect().toSet == Set(4L))

    writeDay2(drop)
    assert(FraudEtlPipeline.runDaily(spark, layout, clients, accounts)
      .contains("2021-03-02"))

    val hist2 = spark.read.parquet(layout.historyPath)
    // T1 changed (closed + reopened), T2 deleted (closed + tombstone), T3 new
    assert(hist2.count() == 5)
    assert(hist2.filter(col("terminal_id") === "T1" &&
      col("terminal_city") === "Riga" &&
      col("effective_to") === graft.etl.Scd2.HighDate).count() == 1)
    assert(hist2.filter(col("terminal_id") === "T2" &&
      col("deleted_flg") === 1L).count() == 1)

    val mart2 = spark.read.parquet(layout.martPath)
    // day-2 adds the amount-guessing hit for client 2 (+ account_fraud rows)
    assert(mart2.filter(col("rule") === "guessing_amount_fraud")
      .select("client_key").as[Long].collect().toSet == Set(2L))
    assert(mart2.filter(col("rule") === "account_fraud")
      .select("client_key").as[Long].collect().toSet == Set(2L))
    assert(mart2.count() > mart1.count())

    // drops consumed and archived; a third run finds nothing
    assert(Files.list(drop).count() == 0)
    assert(Files.list(root.resolve("archive")).count() == 6)
    assert(FraudEtlPipeline.runDaily(spark, layout, clients, accounts).isEmpty)
  }
}
