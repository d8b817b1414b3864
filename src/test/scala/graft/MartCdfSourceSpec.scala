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
}
