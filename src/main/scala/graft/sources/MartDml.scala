package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}

/** B39 — predicate DELETE / UPDATE on an AtomicMart: the Delta
  * `DELETE FROM t WHERE p` / `UPDATE t SET c = v WHERE p` public
  * semantics, as a partition-pruned copy-on-write rewrite landing in
  * ONE OCC commit.
  *
  * B19 erases by subject key-list and B33 merges a CDC delta; this is
  * the general form the first predicate-shaped compliance ticket needs
  * ("delete everything WHERE region = 'EU' AND ts < cutoff"). Three
  * phases, each bounded by metadata where possible:
  *
  *  1. PRUNE (driver-side, zero I/O): the predicate's conjuncts are
  *     matched against the manifest — partition VALUES and per-column
  *     stats ([[AtomicMart.pruneEntries]], the same multi-column
  *     skipper reads use) — so partitions the predicate provably
  *     cannot touch are never even listed.
  *  2. FIND (one pushed-down scan of the surviving partitions): the
  *     exact predicate runs over the candidates and the DISTINCT
  *     partition tuples containing matches come back to the driver —
  *     a partition-count-bounded list, never row-sized.
  *  3. REWRITE + COMMIT: only the touched partitions are re-staged
  *     (delete: rows failing the predicate; update: assignments
  *     applied under `when(predicate)`), and
  *     [[AtomicMart.publishReplacing]] swaps them in as one commit
  *     pinned to the manifest version phase 1 read (`baseVersion`) —
  *     a concurrent writer on any touched partition is a loud OCC
  *     conflict, never a lost update. Untouched partitions keep their
  *     manifest pointers byte-identically; concurrent readers stay on
  *     their bound snapshot throughout (B27).
  *
  * At 100 TB the cost is proportional to the touched partitions, not
  * the table: phase 1 is metadata, phase 2 scans only what stats
  * could not exclude (with the predicate pushed to parquet), phase 3
  * rewrites only partitions that actually contain matches. A
  * no-match predicate costs one pruned scan and commits NOTHING (the
  * version head does not move — there is no empty commit to vacuum).
  *
  * Reference analog: the reference updates its sqlite marts with
  * in-place SQL UPDATE/DELETE (single-writer, no isolation);
  * rep_fraud.py:110-184 re-derives entire tables instead. This gives
  * the same statement semantics with snapshot isolation and
  * concurrent-writer safety.
  */
object MartDml {

  /** version = the commit that landed (or the unchanged head when
    * nothing matched); rewritten/untouched count PARTITIONS. */
  final case class DmlResult(version: Long, rewritten: Int, untouched: Int)

  /** `DELETE FROM path WHERE predicate`. SQL DELETE removes only rows
    * where the predicate is TRUE; a NULL predicate (e.g. a comparison
    * over a NULL column) KEEPS the row — hence `not(coalesce(p,
    * false))`, because a bare `not(NULL)` is NULL and `filter` would
    * silently drop the row. This also matches phase 2, which finds
    * touched partitions with `filter(p)` (TRUE only). */
  def delete(spark: SparkSession, path: String, predicate: Column,
             statCols: Seq[String] = Nil,
             layout: Option[DataFrame => DataFrame] = None): DmlResult =
    rewrite(spark, path, predicate, statCols, layout)(
      df => df.filter(not(coalesce(predicate, lit(false)))))

  /** `UPDATE path SET assignments WHERE predicate`. Assignments may
    * not target partition columns (that is a move between partitions —
    * express it as DELETE + publish, which keeps each commit's
    * replaced-set explicit). Each assignment must keep its column's
    * type: the rewrite is `when(p, expr).otherwise(old)`, so a widening
    * expression would silently widen the whole column. */
  def update(spark: SparkSession, path: String, predicate: Column,
             assignments: Map[String, Column],
             statCols: Seq[String] = Nil,
             layout: Option[DataFrame => DataFrame] = None): DmlResult = {
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    val partCols = AtomicMart.readManifest(spark, path)
      .map(AtomicMart.logicalPartCols).getOrElse(Nil)
    val hit = assignments.keySet.intersect(partCols.toSet)
    require(hit.isEmpty,
      s"UPDATE may not assign partition column(s) ${hit.mkString(", ")} — " +
        "a partition move is DELETE + publish, which keeps the replaced set explicit")
    rewrite(spark, path, predicate, statCols, layout) { df =>
      assignments.foldLeft(df) { case (d, (c, v)) =>
        d.withColumn(c, when(predicate, v).otherwise(col(c)))
      }
    }
  }

  /** I32 — `layout` re-clusters the REWRITTEN partitions before they
    * stage (the same hook [[AtomicMart.compact]] exposes): a DML
    * rewrite otherwise inherits whatever row order the read produced,
    * so a DELETE-heavy table slowly loses the row-group skipping power
    * its original I11 z-order / I22 range layout paid for. Cost is
    * one range exchange over ONLY the touched partitions' rows. */
  private def rewrite(spark: SparkSession, path: String, predicate: Column,
                      statCols: Seq[String],
                      layout: Option[DataFrame => DataFrame] = None)
                     (transform: DataFrame => DataFrame): DmlResult = {
    val m = AtomicMart.readManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    val (candidates, _) = AtomicMart.pruneEntries(spark, m, predicate)
    if (candidates.isEmpty)
      return DmlResult(m.version, 0, m.entries.size)
    // phase 2: exact match → touched partition tuples (driver list is
    // partition-bounded; the scan pushes the predicate into parquet)
    // conform so the predicate (and assignments) may reference columns
    // added by a B42 evolution that old snapshots don't carry yet
    val candDf = AtomicMart.conform(spark, AtomicMart.readEntries(spark, candidates), m)
    // the conformed frame speaks LOGICAL names (B43); entry values are
    // positional, so the physical/logical split never touches them
    val lpc = AtomicMart.logicalPartCols(m)
    val touched: Seq[Seq[String]] = candDf.filter(predicate)
      .select(lpc.map(c => col(c).cast("string").as(c)): _*)
      .distinct().collect()
      .map(r => lpc.indices
        .map(i => Option(r.getString(i)).getOrElse("__HIVE_DEFAULT_PARTITION__")): Seq[String])
      .toSeq
    if (touched.isEmpty)
      return DmlResult(m.version, 0, m.entries.size)
    val touchedSet = touched.toSet
    val tEntries = m.entries.filter(e => touchedSet.contains(e.values))
    val out0 = transform(AtomicMart.conform(spark, AtomicMart.readEntries(spark, tEntries), m))
    val out = layout.fold(out0)(l => l(out0))
    val v = AtomicMart.publishReplacing(out, path, lpc, touched,
      baseVersion = Some(m.version), statCols = statCols)
    DmlResult(v, touched.size, m.entries.size - touched.size)
  }
}
