package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{AtomicMart, MartCdf, MartDml}
import graft.streaming.MartCdfSource

/** F40 — the change feed as a REAL structured-streaming source:
  * Spark's checkpoint is the offset store (Delta-source parity), each
  * micro-batch delivers a version-range ticket, and the consumer
  * derives the distributed change frame inside foreachBatch. */
class MartCdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mart(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("k", "v", "part")

  test("F40 readStream: initial snapshot, incremental range, checkpointed restart, idle no-op") {
    val root = Files.createTempDirectory("graft_cdfsource")
    val table = root.resolve("mart").toString
    val cp = root.resolve("cp").toString

    AtomicMart.publish(mart((1L, 10L, "p1"), (2L, 20L, "p1")), table, Seq("part"))
    AtomicMart.publish(mart((3L, 30L, "p2")), table, Seq("part"))

    val delivered = ArrayBuffer.empty[(String, Long, Long)] // (_change_type, k, v)
    def drain(): Unit = {
      val q = spark.readStream.format("graft.streaming.MartCdfSource")
        .option("path", table).load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (tickets: DataFrame, _: Long) =>
          MartCdfSource.changesFor(tickets, table, keyCols = Seq("k")).foreach { ch =>
            delivered ++= ch.select(col(MartCdf.ChangeType), col("k"), col("v"))
              .as[(String, Long, Long)].collect()
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // first run: ONE ticket (-1 -> head): the pinned initial snapshot
    drain()
    assert(delivered.toSet ==
      Set(("insert", 1L, 10L), ("insert", 2L, 20L), ("insert", 3L, 30L)))

    // a keyed rewrite lands; the SAME checkpoint must deliver ONLY the
    // delta — not the snapshot again (offsets survived the restart)
    delivered.clear()
    MartDml.update(spark, table, col("k") === 1L, Map("v" -> lit(11L)))
    drain()
    assert(delivered.toSet ==
      Set(("update_preimage", 1L, 10L), ("update_postimage", 1L, 11L)))

    // idle run: no commits since the checkpoint -> nothing delivered
    delivered.clear()
    drain()
    assert(delivered.isEmpty, s"idle drain delivered: $delivered")

    // the fold contract end-to-end: initial snapshot + all deltas
    // reproduce the head (consume from a FRESH checkpoint)
    val cp2 = root.resolve("cp2").toString
    val all = ArrayBuffer.empty[(String, Long, Long)]
    val q2 = spark.readStream.format("graft.streaming.MartCdfSource")
      .option("path", table).load()
      .writeStream.option("checkpointLocation", cp2)
      .foreachBatch { (tickets: DataFrame, _: Long) =>
        MartCdfSource.changesFor(tickets, table, keyCols = Seq("k")).foreach { ch =>
          all ++= ch.select(col(MartCdf.ChangeType), col("k"), col("v"))
            .as[(String, Long, Long)].collect()
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val folded = all.filter(t => t._1 == "insert" || t._1 == "update_postimage")
      .map(t => t._2 -> t._3).toMap --
      all.filter(_._1 == "delete").map(_._2)
    val head = AtomicMart.read(spark, table)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(folded == head, s"folded=$folded head=$head")
  }

  test("F40 maxVersionsPerTrigger: a multi-version backfill drains in bounded tickets (VERDICT r12 #7)") {
    val root = Files.createTempDirectory("graft_cdfsource_lim")
    val table = root.resolve("mart").toString
    val cp = root.resolve("cp").toString

    // five retained versions v0..v4, one row each (distinct partitions
    // — a same-valued partition would be REPLACED, not appended)
    (0L to 4L).foreach { i =>
      AtomicMart.publish(mart((i, i * 10L, s"p$i")), table, Seq("part"))
    }

    val tickets = ArrayBuffer.empty[(Long, Long)]
    val rows = ArrayBuffer.empty[(String, Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft.streaming.MartCdfSource")
        .option("path", table).option("maxVersionsPerTrigger", "2").load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (t: DataFrame, _: Long) =>
          tickets ++= t.select(col("from_version"), col("to_version"))
            .as[(Long, Long)].collect()
          MartCdfSource.changesFor(t, table, keyCols = Seq("k")).foreach { ch =>
            rows ++= ch.select(col(MartCdf.ChangeType), col("k"), col("v"))
              .as[(String, Long, Long)].collect()
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // the backfill splits into bounded ranges: snapshot pinned at
    // (-1 + 2) = v1, then <=2-version increments to the prepared head
    drain()
    assert(tickets.toSeq == Seq((-1L, 1L), (1L, 3L), (3L, 4L)),
      s"tickets=$tickets")
    // exactly-once equivalence with the unlimited single-ticket run:
    // snapshot@1 (keys 0,1) + inserts of v2..v4 = the head key set
    val folded = rows.filter(t => t._1 == "insert" || t._1 == "update_postimage")
      .map(t => t._2 -> t._3).toMap
    val head = AtomicMart.read(spark, table)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(folded == head, s"folded=$folded head=$head")

    // two more commits; the SAME checkpoint resumes with one bounded
    // ticket (4 -> 6), not a re-read
    tickets.clear(); rows.clear()
    (5L to 6L).foreach { i =>
      AtomicMart.publish(mart((i, i * 10L, s"p$i")), table, Seq("part"))
    }
    drain()
    assert(tickets.toSeq == Seq((4L, 6L)), s"tickets=$tickets")
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set(("insert", 5L), ("insert", 6L)), s"rows=$rows")
  }
}
