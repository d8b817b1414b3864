package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.AtomicMart

/** B33 — MERGE INTO on a live AtomicMart table: apply a CDC op-log
  * (B23's Debezium-shaped (key, lsn, op, payload) stream) to a
  * published mart as ONE atomic commit that rewrites ONLY the
  * partitions the delta touches.
  *
  * This is the day-2 shape of the lake story: B27 republishes whole
  * batches, but a CDC feed delivers a few thousand changed rows
  * against a 100 TB table — rereading or rewriting anything beyond the
  * touched partitions would be the scale-killer. Here:
  *
  *  1. the touched partition set is the delta's OWN distinct partition
  *     tuples (partition-count-sized driver work, never data-sized);
  *  2. only those partitions' current rows are read (manifest-pruned,
  *     version-pinned — no file outside them is even listed);
  *  3. current rows enter the fold as inserts at lsn = -∞, so B23's
  *     one-window-pass semantics (lsn order, tombstones, I-after-D
  *     resurrection) apply verbatim on top of the snapshot;
  *  4. the rewritten partitions commit via ONE OCC publish that
  *     declares its read version: a concurrent writer to a DIFFERENT
  *     partition rebases cleanly underneath, a concurrent writer to
  *     the SAME partition turns into a loud
  *     [[AtomicMart.PartitionConflictException]], never a lost update.
  *
  * CONTRACT: partition values must be stable per key (derived from the
  * key, as in `part = k % n` or an immutable event date). A key that
  * "moves" partitions is only merged correctly if its OLD partition
  * also appears in the delta; with unstable partition values use a
  * full republish instead. Same posture as partition-pruned MERGE in
  * any lake format.
  *
  * Equivalence (the oracle's check): because per-key delta lsns exceed
  * every base lsn, fold(fold(base) ∪ delta) ≡ fold(base ∪ delta) — the
  * merged table equals a full recompute from the whole log, which is
  * exactly what the DuckDB twin of `q_mart_merge` computes.
  */
object MartMerge {

  /** Apply `delta` to the mart at `path`. Returns the committed
    * version (or the current one when the delta is empty). */
  def merge(spark: SparkSession, path: String, delta: DataFrame,
            partCols: Seq[String], key: String = "k", lsn: String = "lsn",
            op: String = "op", statCols: Seq[String] = Nil): Long = {
    val readV = AtomicMart.currentVersion(spark, path)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $path"))

    // 1. touched partitions: bounded by the partition count
    val touched: Seq[Seq[String]] = delta
      .select(partCols.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map(r => partCols.indices.map(i => r.getString(i)): Seq[String]).toSeq
    if (touched.isEmpty) return readV

    // 2. current rows of ONLY those partitions, version-pinned
    val current = AtomicMart.readPartitions(spark, path, touched, Some(readV))

    // 3. snapshot rows fold as inserts below every real lsn
    val payload = delta.columns.filterNot(Seq(key, lsn, op).contains).toSeq
    val asOps =
      if (current.columns.isEmpty)
        delta.limit(0) // table had no live rows in the touched partitions
      else current.select(
        (col(key) +: lit(Long.MinValue).as(lsn) +: lit("I").as(op) +:
          payload.map(col)): _*)
    val folded = Cdc.applyLog(asOps.unionByName(delta.select(asOps.columns.map(col): _*)),
        key, lsn, op)
      .select((col(key) +: payload.map(col)): _*)

    // 4. one OCC commit replacing exactly the touched partitions
    AtomicMart.publishReplacing(folded, path, partCols, touched,
      baseVersion = Some(readV), statCols = statCols)
  }
}
