package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.util.UUID

/** B27 — crash-atomic, snapshot-isolated mart publish.
  *
  * [[ReportMart.publishDay]] (B15) converges on re-run, but a reader
  * CONCURRENT with the dynamic partition overwrite can observe a
  * half-replaced partition: the overwrite deletes and rewrites files
  * in place. This sink closes that gap with the manifest-commit
  * pattern every serious lake format uses (Iceberg/Delta snapshot
  * semantics, reduced to the minimum that parquet + a filesystem
  * rename can carry):
  *
  *  - every publish STAGES its partitioned data under a fresh
  *    `data/snap-<uuid>/` directory that no manifest references yet —
  *    a crash anywhere during staging leaves the table byte-identical
  *    (the orphan snapshot is invisible and vacuumable);
  *  - the COMMIT is a single atomic rename of a temp file to
  *    `_versions/v<N>.json`, whose body maps each live logical
  *    partition to the snapshot directory serving it (new partitions
  *    point at the new snapshot, untouched partitions keep their old
  *    pointers);
  *  - a READER resolves the highest committed version once, then reads
  *    only the directories that manifest names. Committed snapshots
  *    are immutable — nothing ever rewrites a directory an older
  *    manifest references — so every reader sees exactly one version:
  *    all-old or all-new, never a mix.
  *
  * On HDFS the rename is atomic by contract. On an object store the
  * same design holds with the manifest PUT made conditional
  * (if-none-match) — the data path never needs atomicity because data
  * is immutable once staged; only the one tiny manifest file does.
  * That is precisely why the commit is a manifest and not a directory
  * swap.
  *
  * Reference analog: data_to_db.py's archive step is the single-writer
  * publish this generalizes; the reference has no concurrent-reader
  * story at all (sqlite single file).
  */
object AtomicMart {

  private val VersionsDir = "_versions"
  private val DataDir = "data"

  /** One live logical partition: values aligned with partCols, plus
    * the absolute directory that serves it. */
  final case class Entry(values: Seq[String], dir: String)

  final case class Manifest(version: Long, partCols: Seq[String], entries: Seq[Entry])

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- manifest (de)serialization: hand-rolled JSON, zero extra deps ----

  private[sources] def jq(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[sources] def render(m: Manifest): String = {
    val cols = m.partCols.map(jq).mkString("[", ",", "]")
    val entries = m.entries.map { e =>
      s"""{"values":${e.values.map(jq).mkString("[", ",", "]")},"dir":${jq(e.dir)}}"""
    }.mkString("[", ",", "]")
    s"""{"version":${m.version},"partCols":$cols,"entries":$entries}"""
  }

  // Minimal parser for exactly the JSON `render` produces (strings are
  // uuid paths + partition values we wrote ourselves, so the only
  // escapes that occur are the ones jq emits).
  /** Every jq-escaped string literal in `arr`, in order. */
  private[sources] def jstrings(arr: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < arr.length) {
        if (arr(i) == '"') {
          val sb = new StringBuilder
          i += 1
          while (arr(i) != '"') {
            if (arr(i) == '\\') {
              i += 1
              arr(i) match {
                case 'n' => sb += '\n'
                case 'r' => sb += '\r'
                case 't' => sb += '\t'
                case 'u' => sb += Integer.parseInt(arr.substring(i + 1, i + 5), 16).toChar; i += 4
                case c => sb += c
              }
            } else sb += arr(i)
            i += 1
          }
          out += sb.result()
        }
        i += 1
      }
      out.result()
  }

  private[sources] def parse(body: String, version: Long): Manifest = {
    val colsStart = body.indexOf("\"partCols\":[") + "\"partCols\":[".length
    val colsEnd = body.indexOf("]", colsStart)
    val partCols = jstrings(body.substring(colsStart, colsEnd))
    val entriesStart = body.indexOf("\"entries\":[") + "\"entries\":[".length
    val entriesBody = body.substring(entriesStart, body.lastIndexOf("]"))
    val entries = "\\{[^}]*\\}".r.findAllIn(entriesBody).map { obj =>
      val vs = obj.substring(obj.indexOf("\"values\":[") + "\"values\":[".length, obj.indexOf("],\"dir\""))
      val dir = jstrings(obj.substring(obj.indexOf("\"dir\":") + "\"dir\":".length)).head
      Entry(jstrings(vs), dir)
    }.toSeq
    Manifest(version, partCols, entries)
  }

  /** Highest committed manifest version, if any. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val dir = new Path(path, VersionsDir)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }
    if (versions.isEmpty) None else Some(versions.max)
  }

  private def manifestAt(spark: SparkSession, path: String, v: Long): Manifest = {
    val f = fs(spark, path)
    val file = new Path(path, f"$VersionsDir/v$v%09d.json")
    require(f.exists(file), s"no committed version $v at $path")
    val in = f.open(file)
    val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    parse(body, v)
  }

  private def readManifest(spark: SparkSession, path: String): Option[Manifest] =
    currentVersion(spark, path).map(manifestAt(spark, path, _))

  /** Stage the batch's data under a fresh immutable snapshot dir and
    * return the partition entries it carries. Public so the crash test
    * can stop HERE (stage, no commit) and assert readers still see the
    * old version. */
  def stage(mart: DataFrame, path: String, partCols: Seq[String]): (String, Seq[Entry]) = {
    require(partCols.nonEmpty, "AtomicMart is a partitioned sink; give >=1 partition column")
    val spark = mart.sparkSession
    val snapDir = s"$path/$DataDir/snap-${UUID.randomUUID()}"
    mart.write.partitionBy(partCols: _*).parquet(snapDir)
    val f = fs(spark, path)
    // Walk the partition tree the write produced: each leaf dir is one
    // logical partition, its values parsed from the col=value segments.
    def leaves(dir: Path, depth: Int, acc: Seq[String]): Seq[Entry] =
      if (depth == partCols.length) Seq(Entry(acc, dir.toString))
      else f.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap { s =>
          val v = URLDecoder.decode(s.getPath.getName.split("=", 2)(1), "UTF-8")
          leaves(s.getPath, depth + 1, acc :+ v)
        }
    (snapDir, leaves(new Path(snapDir), 0, Nil))
  }

  /** Commit staged entries: next manifest = previous entries whose
    * partition values are NOT republished here (and not in `drops`) +
    * the staged entries. `drops` retracts partitions even when nothing
    * re-stages them — the erasure case, where a partition's every row
    * belonged to the erased subject and the "replacement" is nothing.
    * The rename is the single atomic commit point. */
  def commit(spark: SparkSession, path: String, staged: Seq[Entry], partCols: Seq[String],
             drops: Set[Seq[String]] = Set.empty): Long = {
    val f = fs(spark, path)
    val prev = readManifest(spark, path)
    prev.foreach { m =>
      require(m.partCols == partCols,
        s"partition columns changed: table has ${m.partCols}, publish has $partCols")
    }
    val replaced = staged.map(_.values).toSet ++ drops
    val kept = prev.map(_.entries).getOrElse(Nil).filterNot(e => replaced.contains(e.values))
    val next = prev.map(_.version + 1).getOrElse(0L)
    val manifest = Manifest(next, partCols, kept ++ staged)
    f.mkdirs(new Path(path, VersionsDir))
    val tmp = new Path(path, s"$VersionsDir/.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(render(manifest).getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dest = new Path(path, f"$VersionsDir/v$next%09d.json")
    if (!f.rename(tmp, dest)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"commit of version $next lost a race (single-writer contract violated?): $dest exists")
    }
    next
  }

  /** Publish one batch atomically: stage, then manifest-commit. */
  def publish(mart: DataFrame, path: String, partCols: Seq[String]): Long = {
    val (_, entries) = stage(mart, path, partCols)
    commit(mart.sparkSession, path, entries, partCols)
  }

  /** B15-shaped convenience: the daily fraud-mart publish. */
  def publishDay(mart: DataFrame, path: String): Long =
    publish(mart, path, Seq("rule", "batch_date"))

  /** Publish that REPLACES an explicit partition set: every partition
    * in `replaced` is retracted, then whatever `mart` stages (a subset
    * of `replaced`, possibly empty for some partitions) is added. The
    * erasure/compaction primitive: "these partitions are now exactly
    * this data — including none". */
  def publishReplacing(mart: DataFrame, path: String, partCols: Seq[String],
                       replaced: Seq[Seq[String]]): Long = {
    val (_, entries) = stage(mart, path, partCols)
    val extra = entries.map(_.values).filterNot(replaced.contains)
    require(extra.isEmpty,
      s"staged data carries partitions outside the replaced set: $extra")
    commit(mart.sparkSession, path, entries, partCols, replaced.toSet)
  }

  /** Snapshot-isolated read: binds to the highest committed version at
    * CALL time and reads only the directories that manifest names.
    * Partition columns are restored from directory names via basePath
    * (all of one snapshot's leaves share their snapshot root). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = readManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    readEntries(spark, m.entries)
  }

  /** B31 — TIME TRAVEL: read the table exactly as version `v` committed
    * it. Free by construction: every commit's manifest is an immutable
    * file and committed snapshots are never rewritten, so any retained
    * version reconstructs byte-identically. The one caveat is the same
    * retention contract every lake format carries: [[vacuum]] reclaims
    * snapshots the LATEST manifest no longer references, after which
    * older versions pointing into them stop being readable — time
    * travel reaches as far back as the vacuum horizon. */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame =
    readEntries(spark, manifestAt(spark, path, v).entries)

  /** Read a live entry set: group leaves by snapshot root so each
    * group reads with one basePath (restoring partition columns from
    * directory names); union the (few, one per live publish) groups. */
  private[sources] def readEntries(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    if (entries.isEmpty)
      return spark.emptyDataFrame
    val bySnap = entries.groupBy(e => e.dir.substring(0, e.dir.indexOf("/", e.dir.indexOf("snap-"))))
    bySnap.map { case (snapRoot, es) =>
      spark.read.option("basePath", snapRoot).parquet(es.map(_.dir): _*)
    }.reduce(_.unionByName(_))
  }

  /** Read one manifest-pruned partition subset: entries are filtered
    * DRIVER-side against the manifest before any file is listed — the
    * manifest is the partition index. */
  def readWhere(spark: SparkSession, path: String, col: String, value: String): DataFrame = {
    val m = readManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    val i = m.partCols.indexOf(col)
    require(i >= 0, s"$col is not a partition column (${m.partCols})")
    readEntries(spark, m.entries.filter(_.values(i) == value))
  }

  /** B32 — SHALLOW CLONE: a new independent table whose v0 manifest
    * points at the SOURCE's current snapshot directories — zero data
    * copied (Delta's shallow-clone semantics, public). The clone then
    * evolves independently: its own publishes stage under its own
    * root; the shared snapshots are immutable so neither side can
    * disturb the other's reads. Two explicit caveats, both inherent to
    * the pattern: the clone's vacuum NEVER deletes borrowed dirs
    * (they live outside its data root — [[vacuum]] only lists its
    * own), but the SOURCE's vacuum doesn't know about borrowers, so
    * cloning pins a retention obligation on the source exactly like a
    * long-lived reader version does. */
  def shallowClone(spark: SparkSession, src: String, dst: String): Long = {
    val m = readManifest(spark, src).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $src"))
    val f = fs(spark, dst)
    require(currentVersion(spark, dst).isEmpty, s"$dst already has commits")
    f.mkdirs(new Path(dst, VersionsDir))
    val tmp = new Path(dst, s"$VersionsDir/.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(render(Manifest(0L, m.partCols, m.entries))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(dst, f"$VersionsDir/v${0L}%09d.json")
    if (!f.rename(tmp, dest))
      throw new IllegalStateException(s"clone commit lost a race at $dest")
    0L
  }

  /** Delete snapshot directories no longer referenced by the LATEST
    * manifest (failed stages, replaced partitions). Safe only once no
    * reader still holds an older version — the retention window is the
    * caller's contract, as in every lake format. Returns dirs removed. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val live: Set[String] = readManifest(spark, path)
      .map(_.entries.map(e => e.dir.substring(0, e.dir.indexOf("/", e.dir.indexOf("snap-")))).toSet)
      .getOrElse(Set.empty)
    val dataRoot = new Path(path, DataDir)
    if (!f.exists(dataRoot)) return Nil
    f.listStatus(dataRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap-"))
      .filterNot(s => live.contains(s.getPath.toString))
      .map { s => f.delete(s.getPath, true); s.getPath.toString }
  }
}
