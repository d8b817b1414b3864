package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** B40 — CHANGE DATA FEED: the row-level delta BETWEEN two retained
  * versions of an AtomicMart (Delta's `table_changes` public
  * semantics, derived rather than write-time-logged).
  *
  * AtomicMart retains every committed manifest inside the vacuum
  * horizon (B31/B37), and committed snapshot dirs are immutable — so
  * the feed needs no extra write-path bookkeeping: it is DERIVED from
  * the two manifests at read time.
  *
  *  - PARTITION diff first (driver-side, zero I/O): a partition whose
  *    manifest pointer is IDENTICAL in both versions cannot have
  *    changed (dirs are immutable) and is never read. Only pointers
  *    that differ — replaced, added, retracted partitions — are
  *    scanned. At 100 TB this is the load-bearing bound: a feed
  *    between adjacent versions reads ~one commit's partitions, not
  *    the table.
  *  - ROW diff on what remains: multiset `EXCEPT ALL` both ways —
  *    rows only in `from` are deletes, rows only in `to` are inserts.
  *    With `keyCols` given, a key present on BOTH sides of the diff is
  *    reclassified as `update_preimage`/`update_postimage` (Delta's
  *    four-valued `_change_type`); without keys the feed is I/D-only,
  *    exactly what a snapshot-derived CDF can know.
  *
  * The fold contract (pinned in AtomicMartSpec): applying the feed to
  * version `from` reproduces version `to` exactly —
  * `from ∖ (deletes ∪ preimages) ⊎ (inserts ∪ postimages) = to`.
  *
  * Versions outside the vacuum horizon fail LOUDLY: the manifest
  * either no longer exists (require in manifestAt) or names snapshot
  * dirs vacuum reclaimed (the read throws path-not-found) — never a
  * silent partial feed. The B23 CDC fold is the natural consumer.
  */
object MartCdf {

  val ChangeType = "_change_type"

  /** B41 — EXACTLY-ONCE incremental consumption of the change feed
    * (the Delta streaming-source semantic, batch-incremental form): a
    * durable BOOKMARK under `bookmarkPath` records the last version a
    * consumer fully processed, [[tailStart]] emits everything between
    * bookmark and head, and [[tailCommit]] advances the bookmark only
    * AFTER the caller's own processing committed. A crash between the
    * two replays the SAME range on the next start — at-least-once
    * delivery that composes to exactly-once with any idempotent sink
    * (e.g. [[AtomicMart.publishEpoch]] keyed by `toVersion`, the F35
    * pattern). The bookmark advance is the same create-if-absent
    * primitive the manifest commit uses, so a duplicate commit of the
    * same range is a no-op, never a skipped range.
    *
    * First call (no bookmark yet): the CURRENT snapshot arrives as
    * `insert` rows — Delta's initial-snapshot semantic — and the
    * bookmark lands at the head it read. */
  final case class Tail(changes: DataFrame, fromVersion: Long, toVersion: Long)

  def tailStart(spark: SparkSession, path: String, bookmarkPath: String,
                keyCols: Seq[String] = Nil): Tail = {
    val head = AtomicMart.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    tailStartAt(spark, path, bookmarkPath, head, keyCols)
  }

  /** [[tailStart]] against a caller-PINNED head version — the B44
    * consistent-pair consumer pins both tables' heads under one
    * no-pending-transaction observation and tails each to its pin. A
    * bookmark already at/past the pin yields an empty range (another
    * consumer of the same bookmark advanced it), never a crash. */
  def tailStartAt(spark: SparkSession, path: String, bookmarkPath: String,
                  head: Long, keyCols: Seq[String] = Nil): Tail = {
    bookmark(spark, bookmarkPath) match {
      case None =>
        // Read the PINNED head version, not read(...)'s latest-at-call:
        // a commit landing between currentVersion and the read would
        // otherwise deliver its rows inside the initial snapshot while
        // the bookmark lands at the stale head — the next tail would
        // re-deliver them as changes (duplicates a toVersion-keyed
        // idempotent sink cannot dedupe).
        Tail(AtomicMart.readVersion(spark, path, head)
          .withColumn(ChangeType, lit("insert")), -1L, head)
      case Some(v) if v >= head =>
        // bookmark at/past the pinned head: empty range (shaped like
        // the table at the pin)
        Tail(AtomicMart.readVersion(spark, path, head).limit(0)
          .withColumn(ChangeType, lit("")), v, v)
      case Some(v) =>
        Tail(readChanges(spark, path, v, head, keyCols), v, head)
    }
  }

  def tailCommit(spark: SparkSession, bookmarkPath: String, toVersion: Long): Unit = {
    val f = new org.apache.hadoop.fs.Path(bookmarkPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(bookmarkPath))
    val dest = new org.apache.hadoop.fs.Path(bookmarkPath, f"bk-$toVersion%09d")
    try f.create(dest, false).close()
    catch { case _: java.io.IOException => () } // same range twice: no-op
  }

  private def bookmark(spark: SparkSession, bookmarkPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(bookmarkPath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return None
    val vs = f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("bk-")).map(_.stripPrefix("bk-").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  def readChanges(spark: SparkSession, path: String, vFrom: Long, vTo: Long,
                  keyCols: Seq[String] = Nil): DataFrame = {
    require(vFrom <= vTo, s"readChanges wants vFrom <= vTo, got $vFrom > $vTo")
    val mf = AtomicMart.manifestAt(spark, path, vFrom)
    val mt = AtomicMart.manifestAt(spark, path, vTo)
    val fromDirs = mf.entries.map(e => e.values -> e.dir).toMap
    val toDirs = mt.entries.map(e => e.values -> e.dir).toMap
    // identical pointer ⇒ identical (immutable) data ⇒ no changes
    val changed = (fromDirs.keySet ++ toDirs.keySet)
      .filter(v => fromDirs.get(v) != toDirs.get(v))
    // Both sides conform to vTo's schema (B42): across an ADD COLUMN /
    // mergeSchema evolution the feed WIDENS — old rows read with NULL
    // in the added columns, so the diff still folds from→to exactly.
    // A narrower fold target than "the to-version's schema" cannot
    // exist: that schema is what applying the feed must reproduce.
    val oldDf = AtomicMart.conform(spark, AtomicMart.readEntries(spark,
      mf.entries.filter(e => changed.contains(e.values))), mt)
    val newDf = AtomicMart.conform(spark, AtomicMart.readEntries(spark,
      mt.entries.filter(e => changed.contains(e.values))), mt)
    // a version range with no replaced partitions: empty feed, shaped
    // like the table (vTo's full snapshot supplies the schema)
    if (changed.isEmpty || (oldDf.columns.isEmpty && newDf.columns.isEmpty))
      return AtomicMart.conform(spark, AtomicMart.readEntries(spark, mt.entries), mt)
        .limit(0).withColumn(ChangeType, lit(""))
    val (o, n) =
      if (oldDf.columns.isEmpty) (newDf.limit(0), newDf)
      else if (newDf.columns.isEmpty) (oldDf, oldDf.limit(0))
      else (oldDf, newDf)
    if (keyCols.isEmpty)
      o.exceptAll(n).withColumn(ChangeType, lit("delete"))
        .unionByName(n.exceptAll(o).withColumn(ChangeType, lit("insert")))
    else {
      // Each diff side feeds THREE consumers below (its own semi + anti
      // splits and the other side's key build) — un-materialized, the
      // multiset EXCEPT ALL subtrees (a shuffle of both snapshot sides
      // each) re-ran once per consumer. The diffs are CHANGE-sized —
      // one commit range's delta, bounded far below the table — so one
      // eager cut each is the cheap side of the trade at any scale.
      val deleted = o.exceptAll(n).localCheckpoint(true)
      val inserted = n.exceptAll(o).localCheckpoint(true)
      val delKeys = deleted.select(keyCols.map(col): _*).distinct()
      val insKeys = inserted.select(keyCols.map(col): _*).distinct()
      def split(df: DataFrame, otherKeys: DataFrame, hit: String, miss: String) =
        df.join(otherKeys, keyCols, "left_semi").withColumn(ChangeType, lit(hit))
          .unionByName(
            df.join(otherKeys, keyCols, "left_anti").withColumn(ChangeType, lit(miss)))
      split(deleted, insKeys, "update_preimage", "delete")
        .unionByName(split(inserted, delKeys, "update_postimage", "insert"))
    }
  }
}
