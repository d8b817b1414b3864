package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Production-robustness sweep: EVERY SparkEntry query must plan and
  * execute against an empty warehouse (all tables schema-correct, zero
  * rows) without throwing — the first-daily-load / empty-partition
  * case a 100 TB pipeline hits constantly. Queries whose semantics
  * genuinely require data to exist (trained quantizers — KMeans on an
  * empty frame has no cells to learn) are listed explicitly with the
  * reason, not silently skipped.
  */
class EmptyWarehouseSpec extends SparkSpec {

  // needs a fitted model / non-empty training frame by definition
  private val needsData = Set(
    "q_ann_ivf_learned", // KMeans quantizer: zero vectors → no model
    "q_semdedup")        // same learned-cell dependency

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_wh").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .filter(lit(false))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query executes on a zero-row warehouse without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if needsData(name) => None
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
