package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sources.FixedWidth

/** A9 — fixed-width copybook source: overpunch decode, date decode,
  * pruning, multi-file partitions, loud malformed failures, and the
  * formatLines round trip. */
class FixedWidthSpec extends SparkSpec {
  import spark.implicits._

  private val spec = "acct:6:string,amt:8:cents,day:8:day"

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))

  private def withDir(f: Path => Unit): Unit = {
    val d = Files.createTempDirectory("graft_fw")
    try f(d) finally {
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
    }
  }

  test("A9: zoned-decimal overpunch, dates, trimming, blank lines") {
    withDir { d =>
      write(d, "drop1.dat",
        "ABC   0012345{20240115",   // +123450 cents
        "",                          // blank line skipped
        "XY    0012345}20240115",   // -123450 (} = -0 overpunch)
        "NEG   0001234J20231231")   // J overpunch: -(1234·10+1)
      val df = spark.read.format("graft.sources.FixedWidth")
        .option("fields", spec).load(d.toString + "/*.dat")
      val rows = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toList
      assert(rows.contains(("ABC", 123450L,
        java.time.LocalDate.of(2024, 1, 15).toEpochDay)))
      assert(rows.contains(("XY", -123450L,
        java.time.LocalDate.of(2024, 1, 15).toEpochDay)))
      assert(rows.contains(("NEG", -12341L,
        java.time.LocalDate.of(2023, 12, 31).toEpochDay)))
      assert(rows.length == 3)
    }
  }

  test("A9: one partition per file; pruning decodes only what's asked") {
    withDir { d =>
      write(d, "a.dat", "A1    0000000{20240101")
      write(d, "b.dat", "B2    0000001A20240102")
      val df = spark.read.format("graft.sources.FixedWidth")
        .option("fields", spec).load(d.toString + "/*.dat")
      assert(df.rdd.getNumPartitions == 2)
      // pruned scan: only acct is sliced — a malformed amt elsewhere
      // in the line must not matter when amt isn't selected
      write(d, "c.dat", "C3    XXXXXXXX20240103")
      val acctsOnly = spark.read.format("graft.sources.FixedWidth")
        .option("fields", spec).load(d.toString + "/*.dat")
        .select("acct").as[String].collect().sorted
      assert(acctsOnly.toSeq == Seq("A1", "B2", "C3"))
    }
  }

  test("A9: malformed money fails loudly with file context") {
    withDir { d =>
      write(d, "bad.dat", "OK    12X4567{20240101")
      val ex = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft.sources.FixedWidth")
          .option("fields", spec).load(d.toString + "/*.dat")
          .select("amt").collect()
      }
      assert(ex.getMessage.contains("bad.dat") ||
        Option(ex.getCause).exists(_.getMessage.contains("bad.dat")))
    }
  }

  test("A9: formatLines round-trips through the reader exactly") {
    withDir { d =>
      val src = Seq(
        ("AC1", 123450L, 19737L), ("AC2", -987654L, 19000L),
        ("AC3", 0L, 0L), ("AC4", -5L, 1L))
        .toDF("acct", "amt", "day")
      FixedWidth.formatLines(src, spec)
        .coalesce(1).write.mode("overwrite").text(d.resolve("out").toString)
      val back = spark.read.format("graft.sources.FixedWidth")
        .option("fields", spec).load(d.resolve("out").toString + "/*.txt")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(back == Set(
        ("AC1", 123450L, 19737L), ("AC2", -987654L, 19000L),
        ("AC3", 0L, 0L), ("AC4", -5L, 1L)))
    }
  }
}
