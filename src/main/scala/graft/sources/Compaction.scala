package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B17 — small-file compaction (the OPTIMIZE-style table maintenance
  * every long-lived lake needs: streaming ingest and per-partition
  * appends fragment tables into thousands of KB-sized files, and at
  * 100 TB the scan's task-scheduling + footer-read overhead becomes
  * the bottleneck, not the bytes).
  *
  * Two phases, mirroring Delta/Iceberg OPTIMIZE (public semantics):
  *
  *  - [[plan]]: metadata-only — list file sizes (file-COUNT-sized
  *    driver work, never data-sized) and first-fit-decreasing bin-pack
  *    the under-sized files into rewrite groups of ~`targetBytes`.
  *    Files already ≥ `targetBytes` are left alone (rewriting them
  *    buys nothing and costs a full read+write).
  *
  *  - [[compact]]: each bin is rewritten by its OWN narrow job —
  *    read exactly that bin's files, `coalesce(1)`, write one output
  *    file. NO shuffle anywhere (coalesce over a multi-file scan is a
  *    narrow dependency); bins run as parallel jobs so the rewrite
  *    saturates the cluster while each output file stays one task's
  *    sequential write. Data volume moved = the small files only.
  *
  * The rewrite lands in a fresh directory + atomic-ish swap is left to
  * the caller/catalog (same posture as ReportMart's B15 publish);
  * `compact` itself is pure rewrite mechanics.
  */
object Compaction {

  /** One rewrite group: the small files it merges and their bytes. */
  final case class Bin(files: Seq[String], bytes: Long)

  /** Compaction plan: `bins` to rewrite (≥2 files or 1 under-sized
    * file each… singletons only when a stray small file can't pair),
    * `skipped` files already at target size. */
  final case class Plan(bins: Seq[Bin], skipped: Seq[String]) {
    def outputFiles: Int = bins.length
  }

  /** List `path`'s parquet files and FFD-pack the under-sized ones. */
  def plan(spark: SparkSession, path: String,
           targetBytes: Long): Plan = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(hp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val (big, small) = files.partition(_._2 >= targetBytes)
    // first-fit-decreasing: largest first, into the first bin with room
    val bins = collection.mutable.ArrayBuffer.empty[(collection.mutable.ArrayBuffer[String], Long)]
    small.sortBy { case (f, len) => (-len, f) }.foreach { case (f, len) =>
      bins.find(_._2 + len <= targetBytes) match {
        case Some(b) =>
          b._1 += f
          val i = bins.indexWhere(_ eq b)
          bins(i) = (b._1, b._2 + len)
        case None =>
          bins += ((collection.mutable.ArrayBuffer(f), len))
      }
    }
    Plan(bins.map(b => Bin(b._1.toSeq, b._2)).toSeq, big.map(_._1))
  }

  /** Execute `plan`: rewrite every bin into one file under `outDir`
    * (parallel narrow jobs); returns the per-bin output directories.
    * Skipped (already-compact) files are NOT copied — the caller swaps
    * them in alongside the rewritten bins. */
  def compact(spark: SparkSession, p: Plan, outDir: String): Seq[String] = {
    import scala.collection.parallel.CollectionConverters._
    p.bins.zipWithIndex.par.foreach { case (bin, i) =>
      spark.read.parquet(bin.files: _*).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/bin_$i")
    }
    p.bins.indices.map(i => s"$outDir/bin_$i")
  }
}
