package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Checks

/** B38 — TABLE CONSTRAINTS pinned on an AtomicMart and enforced on
  * EVERY commit path (the Delta `ALTER TABLE ADD CONSTRAINT CHECK`
  * semantics): once declared, a B29 check suite is persisted at the
  * table root, and every writer — publish, publishReplacing, the B33
  * MERGE, the F35 epoch sink, the B19 erasure rewrite — validates its
  * staged frame through the fused one-scan check BEFORE a single data
  * file is written ([[AtomicMart.stage]] is the shared funnel, so no
  * write path can forget). A violation refuses the commit loudly with
  * every failing check's count vs budget; the table is byte-untouched
  * (the refusal happens pre-stage, so there is not even an orphan
  * snapshot to vacuum).
  *
  * Only DECLARATIVE checks persist — NotNull / Bounds-on-a-named-column
  * / Accepted / Unique — because they serialize faithfully to JSON and
  * re-materialize identically in any writer's JVM. `Predicate` (an
  * opaque Column) and `Referential` (a second live frame) are REJECTED
  * at declaration time, loudly, rather than silently narrowed (the F33
  * rule): a constraint that cannot round-trip the manifest is a
  * constraint only SOME writers would enforce.
  *
  * Cost: one extra aggregate scan of the staged frame per publish when
  * constraints exist — the industry-standard price (Deequ/Delta), and
  * it fuses N checks into that one scan (B29). A Unique constraint
  * additionally costs one key-pruned semi-join against the live
  * snapshot per publish (see [[enforce]]) — uniqueness is a TABLE
  * property, so enforcing it only within each batch would advertise a
  * guarantee the table does not hold.
  */
object MartConstraints {

  private val FileName = "constraints.json"
  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r.pattern

  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def renderCheck(c: Checks.Check): String = c match {
    case Checks.NotNull(n, col0, a) =>
      s"""{"kind":"not_null","name":${AtomicMart.jq(n)},"column":${AtomicMart.jq(col0)},"allowed":$a}"""
    case Checks.Bounds(n, col0, lo, hi, a) =>
      val cn = col0.toString()
      require(Ident.matcher(cn).matches(),
        s"constraint '$n': only a plain named column persists in a Bounds " +
          s"table constraint (got expression '$cn') — declare the derived " +
          "column on the mart and bound THAT, or keep the check pipeline-local")
      s"""{"kind":"bounds","name":${AtomicMart.jq(n)},"column":${AtomicMart.jq(cn)},"lo":$lo,"hi":$hi,"allowed":$a}"""
    case Checks.Accepted(n, col0, vs, a) =>
      s"""{"kind":"accepted","name":${AtomicMart.jq(n)},"column":${AtomicMart.jq(col0)},"values":[${vs.map(AtomicMart.jq).mkString(",")}],"allowed":$a}"""
    case Checks.Unique(n, cols0, a) =>
      s"""{"kind":"unique","name":${AtomicMart.jq(n)},"columns":[${cols0.map(AtomicMart.jq).mkString(",")}],"allowed":$a}"""
    case other =>
      throw new IllegalArgumentException(
        s"constraint '${other.name}': ${other.getClass.getSimpleName} checks " +
          "cannot persist as table constraints (an opaque predicate or a " +
          "second frame does not round-trip the manifest) — enforce it " +
          "pipeline-side with Checks.run, or restate it declaratively")
  }

  /** Declare (replace) the table's constraint suite. Validation is
    * EAGER on all three axes an unenforceable declaration could hide
    * behind: (a) names pass the same SafeName gate Checks.run applies,
    * so a name that would brick every later publish is refused here;
    * (b) shapes must serialize declaratively (renderCheck); (c) the
    * EXISTING table data (if any) is scanned through the suite — the
    * Delta `ALTER TABLE ADD CONSTRAINT` semantic — so a constraint the
    * current rows already violate is refused instead of permanently
    * failing every rewrite path that restages old rows (merge,
    * erasure). The install is temp-file + atomic-overwrite rename
    * (FileContext OVERWRITE — no delete-then-rename window), so a
    * concurrently-staging writer reads old-or-new, never a torn file
    * and never an ABSENT one. */
  def set(spark: SparkSession, path: String, checks: Seq[Checks.Check]): Unit = {
    require(checks.nonEmpty, "empty constraint suite — use clear() to drop")
    require(checks.map(_.name).distinct.length == checks.length,
      "constraint names must be unique")
    Checks.requireSafeNames(checks)
    val body = "[" + checks.map(renderCheck).mkString(",") + "]"
    AtomicMart.readRetained(spark, path, Set.empty).foreach { current =>
      val failed = Checks.run(current, checks)
        .filter(org.apache.spark.sql.functions.col("pass") === 0L)
        .collect()
      if (failed.nonEmpty) {
        val detail = failed.map(r =>
          s"${r.getString(0)}: ${r.getLong(1)} violations (allowed ${r.getLong(2)})")
          .mkString("; ")
        throw new ConstraintViolationException(
          s"constraint declaration refused at $path — existing table data " +
            s"violates the suite ($detail); clean the data first or widen the budget")
      }
    }
    val f = fsOf(spark, path)
    f.mkdirs(new Path(path))
    val tmp = new Path(path, s".tmp-constraints-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dest = new Path(path, FileName)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dest.toUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case e: java.io.IOException =>
        f.delete(tmp, false)
        throw new IllegalStateException(s"could not install $dest", e)
    }
  }

  /** Drop the suite (subsequent publishes are unchecked). */
  def clear(spark: SparkSession, path: String): Unit =
    fsOf(spark, path).delete(new Path(path, FileName), false)

  /** The table's declared suite; empty when none was ever set. */
  def get(spark: SparkSession, path: String): Seq[Checks.Check] = {
    val f = fsOf(spark, path)
    val p = new Path(path, FileName)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val body =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    val vs = new AtomicMart.JReader(body).value() match {
      case AtomicMart.JArr(v) => v
      case v => throw new IllegalStateException(s"malformed constraints file: $v")
    }
    vs.map {
      case AtomicMart.JObj(fs) =>
        def s(k: String) = fs(k).asInstanceOf[AtomicMart.JStr].s
        def l(k: String) = fs(k).asInstanceOf[AtomicMart.JNum].n
        s("kind") match {
          case "not_null" => Checks.NotNull(s("name"), s("column"), l("allowed"))
          case "bounds" => Checks.Bounds(s("name"),
            org.apache.spark.sql.functions.col(s("column")),
            l("lo"), l("hi"), l("allowed"))
          case "accepted" => Checks.Accepted(s("name"), s("column"),
            fs("values").asInstanceOf[AtomicMart.JArr].vs
              .map(_.asInstanceOf[AtomicMart.JStr].s), l("allowed"))
          case "unique" => Checks.Unique(s("name"),
            fs("columns").asInstanceOf[AtomicMart.JArr].vs
              .map(_.asInstanceOf[AtomicMart.JStr].s), l("allowed"))
          case k => throw new IllegalStateException(s"unknown constraint kind $k")
        }
      case v => throw new IllegalStateException(s"malformed constraint: $v")
    }
  }

  /** Run the table's suite (if any) against a frame about to stage;
    * throws [[ConstraintViolationException]] naming every failing
    * check with its count vs budget. Called by [[AtomicMart.stage]] —
    * the one funnel every commit path shares.
    *
    * Row-local checks (NotNull/Bounds/Accepted) and within-batch Unique
    * run on the staged frame alone. Unique is additionally enforced
    * TABLE-WIDE: the staged keys are semi-joined against the keys of
    * every row that stays live after this commit (`retracts` excludes
    * the partitions the commit replaces, so a merge/erasure restaging
    * its own rows never collides with itself). Set() already proved
    * the existing data unique, so staged-vs-live is the only new
    * collision surface per batch — one key-pruned scan of the live
    * table per publish, the price of a uniqueness guarantee that
    * actually holds across batches. */
  private[sources] def enforce(spark: SparkSession, path: String,
                               mart: DataFrame,
                               retracts: Set[Seq[String]] = Set.empty): Unit = {
    val checks = get(spark, path)
    if (checks.isEmpty) return
    // All verdict rows, NOT pre-filtered on pass: a Unique check's
    // budget is ONE budget across both collision surfaces, so its
    // within-batch count must be summed with the cross-batch count
    // before comparing — otherwise a batch with `allowed` in-batch
    // duplicates plus `allowed` staged-vs-live collisions passes both
    // gates and lands 2×allowed violations.
    val verdicts = Checks.run(mart, checks).collect()
    val uniques = checks.collect { case u: Checks.Unique => u }
    val crossCounts: Map[String, Long] =
      if (uniques.isEmpty) Map.empty
      else AtomicMart.readRetained(spark, path, retracts).toSeq.flatMap { live =>
        import org.apache.spark.sql.functions.col
        uniques.map { u =>
          val cols = u.columns.map(col)
          u.name -> mart.select(cols: _*)
            .join(live.select(cols: _*), u.columns, "left_semi").count()
        }
      }.toMap
    val detailRows = verdicts.flatMap { r =>
      val (name, within, allowed) = (r.getString(0), r.getLong(1), r.getLong(2))
      val cross = crossCounts.getOrElse(name, 0L)
      if (within + cross > allowed) {
        val note =
          if (cross > 0) s" ($within in-batch + $cross already live in the table)" else ""
        Some(s"$name: ${within + cross} violations$note (allowed $allowed)")
      } else None
    }
    if (detailRows.nonEmpty)
      throw new ConstraintViolationException(
        s"commit refused by table constraints at $path — ${detailRows.mkString("; ")}")
  }
}
