package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.SparkSpec
import graft.sources.AtomicMart

/** ADVICE r13 (MartCdfSource.latestOffset): Spark may hand the source
  * a CompositeReadLimit wrapping its own ReadMaxRows (e.g. trigger
  * composition) — the cap must be extracted from inside it, and an
  * UNRECOGNIZED limit shape must fall back to the configured pacing,
  * never to the full head (pacing regression, exactly-once unaffected
  * either way). Unit-pinned at the stream level because only specific
  * trigger combinations make Spark compose limits. */
class ReadLimitPinSpec extends SparkSpec {
  import spark.implicits._

  private def table(): String = {
    val root = Files.createTempDirectory("graft_readlimit_pin")
    val t = root.resolve("mart").toString
    (0L to 6L).foreach { i =>
      AtomicMart.publish(
        Seq((i, i * 10L, s"p$i")).toDF("k", "v", "part"), t, Seq("part"))
    }
    t
  }

  test("CompositeReadLimit wrapping ReadMaxRows still paces by the inner cap") {
    val t = table()
    val s = new MartCdfSource.CdfMicroBatchStream(t, Some(2L))
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.maxFiles(1000), ReadLimit.maxRows(2L)))
    val end = s.latestOffset(new MartCdfSource.VOffset(-1L), composite)
    assert(end.asInstanceOf[MartCdfSource.VOffset].v == 1L,
      s"composite(maxRows=2) from -1 must admit to version 1, got $end")
    val end2 = s.latestOffset(new MartCdfSource.VOffset(1L), composite)
    assert(end2.asInstanceOf[MartCdfSource.VOffset].v == 3L)
  }

  test("an unrecognized limit shape falls back to the CONFIGURED cap, not the head") {
    val t = table()
    val s = new MartCdfSource.CdfMicroBatchStream(t, Some(2L))
    // minRows is a shape this source never requests — the conservative
    // reading is the configured maxVersionsPerTrigger, not allAvailable
    val end = s.latestOffset(new MartCdfSource.VOffset(-1L), ReadLimit.minRows(1L, 0L))
    assert(end.asInstanceOf[MartCdfSource.VOffset].v == 1L,
      s"unrecognized limit must pace by the configured 2, got $end")
  }

  test("explicit ReadAllAvailable and an unconfigured source still reach the head") {
    val t = table()
    val s = new MartCdfSource.CdfMicroBatchStream(t, Some(2L))
    val all = s.latestOffset(new MartCdfSource.VOffset(-1L), ReadLimit.allAvailable())
    assert(all.asInstanceOf[MartCdfSource.VOffset].v == 6L)
    // no configured cap: composite without an inner maxRows admits all
    val s2 = new MartCdfSource.CdfMicroBatchStream(t, None)
    val end = s2.latestOffset(new MartCdfSource.VOffset(-1L),
      ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(1000))))
    assert(end.asInstanceOf[MartCdfSource.VOffset].v == 6L)
  }
}
