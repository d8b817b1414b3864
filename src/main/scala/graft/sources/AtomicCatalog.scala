package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** B28 — cross-table ATOMIC catalog commit: one rename publishes
  * consistent new versions of SEVERAL tables at once (the multi-table
  * transaction a lifecycle actually needs — B27 secures one table, but
  * a pipeline whose day writes a corpus AND its index, or a mart AND
  * its aggregate, can still crash BETWEEN two single-table commits and
  * leave the pair observably inconsistent; LakeLifecycle's doc lane
  * had exactly that seam and now commits through here).
  *
  * Layout under one catalog root:
  *
  *   root/<table>/data/snap-<uuid>/…   immutable staged data (B27's
  *                                     stage, reused verbatim)
  *   root/_tables/<table>-<uuid>.json  immutable per-table entry list
  *                                     (B27's manifest format, reused)
  *   root/_versions/v<N>.json          the CATALOG manifest: table →
  *                                     per-table manifest file
  *
  * A publish stages every table's batch, writes a NEW per-table
  * manifest for each table it touches (untouched tables keep their old
  * manifest file — pointer reuse, nothing is rewritten), then commits
  * ONE catalog manifest by atomic rename. Readers resolve the highest
  * catalog version once and see every table at that version: the
  * crash window between two tables' commits does not exist, and a
  * cross-table read (corpus ⋈ index) is consistent by construction.
  * Same single-writer contract and object-store posture as B27 (only
  * the one catalog PUT needs a conditional write).
  */
object AtomicCatalog {

  /** One table's batch in a multi-table publish. */
  final case class TableBatch(table: String, df: DataFrame, partCols: Seq[String])

  private val VersionsDir = "_versions"
  private val TablesDir = "_tables"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = new Path(root, VersionsDir)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** table → per-table manifest path, at the highest committed version. */
  private def readCatalog(spark: SparkSession, root: String): Map[String, String] =
    currentVersion(spark, root).map { v =>
      val f = fs(spark, root)
      val in = f.open(new Path(root, f"$VersionsDir/v$v%09d.json"))
      val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      // {"version":N,"tables":[["table","manifestPath"],…]} — parsed
      // with B27's escape-aware reader (table names are user data)
      val root0 = new AtomicMart.JReader(body).value()
        .asInstanceOf[AtomicMart.JObj].fields
      root0("tables").asInstanceOf[AtomicMart.JArr].vs.map { pair =>
        val ps = pair.asInstanceOf[AtomicMart.JArr].vs
          .map(_.asInstanceOf[AtomicMart.JStr].s)
        ps(0) -> ps(1)
      }.toMap
    }.getOrElse(Map.empty)

  private def readTableManifest(spark: SparkSession, root: String,
                                file: String): AtomicMart.Manifest = {
    val f = fs(spark, root)
    val in = f.open(new Path(file))
    val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    AtomicMart.parse(body, 0L)
  }

  /** Stage + commit several tables in ONE atomic step. Per table the
    * merge semantics are B27's: staged partitions replace their own
    * (values-equal) predecessors, untouched partitions keep their old
    * pointers. Tables not in `batches` carry over whole (their
    * manifest FILE is reused, not rewritten). Returns the version. */
  def publish(spark: SparkSession, root: String, batches: Seq[TableBatch]): Long = {
    require(batches.nonEmpty && batches.map(_.table).distinct.length == batches.length,
      "one batch per table")
    val f = fs(spark, root)
    val prior = readCatalog(spark, root)
    // 1. stage every table (crash here: orphans only, old version intact)
    val staged = batches.map { b =>
      val (_, entries) = AtomicMart.stage(b.df, s"$root/${b.table}", b.partCols)
      (b, entries)
    }
    // 2. one NEW immutable per-table manifest per touched table
    f.mkdirs(new Path(root, TablesDir))
    val touched = staged.map { case (b, entries) =>
      val prev = prior.get(b.table).map(readTableManifest(spark, root, _))
      prev.foreach { m =>
        require(m.partCols == b.partCols,
          s"table ${b.table}: partition columns changed (${m.partCols} -> ${b.partCols})")
      }
      val replaced = entries.map(_.values).toSet
      val kept = prev.map(_.entries).getOrElse(Nil).filterNot(e => replaced.contains(e.values))
      val manifest = AtomicMart.Manifest(0L, b.partCols, kept ++ entries)
      val file = new Path(root, s"$TablesDir/${b.table}-${UUID.randomUUID()}.json")
      val out = f.create(file, false)
      try out.write(AtomicMart.render(manifest).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      b.table -> file.toString
    }.toMap
    // 3. the single atomic commit: catalog = untouched pointers + new
    // ones, claimed create-if-absent (B36's primitive — a plain rename
    // would silently overwrite a racing catalog commit on POSIX)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    val tables = (prior ++ touched).toSeq.sortBy(_._1)
      .map { case (t, p) => s"[${AtomicMart.jq(t)},${AtomicMart.jq(p)}]" }
      .mkString("[", ",", "]")
    if (!AtomicMart.claimVersion(f, root,
        s"""{"version":$next,"tables":$tables}""", next))
      throw new IllegalStateException(
        s"catalog commit of version $next lost a race (concurrent catalog writer)")
    next
  }

  /** Snapshot-isolated read of one table at the highest committed
    * catalog version (empty frame if the table has never been
    * published). */
  def read(spark: SparkSession, root: String, table: String): DataFrame =
    readCatalog(spark, root).get(table) match {
      case None => spark.emptyDataFrame
      case Some(file) =>
        AtomicMart.readEntries(spark, readTableManifest(spark, root, file).entries)
    }
}
