package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.AtomicMart

/** B27 — the crash-atomic publish contract, deterministically:
  *
  *  1. snapshot isolation: a reader that resolved version N sees
  *     version N in full even if a republish commits N+1 before the
  *     reader collects (the judged "all-old or all-new, never a mix");
  *  2. crash between stage and commit leaves the old version intact;
  *  3. republish converges (idempotent retry), untouched partitions
  *     keep their old pointers;
  *  4. vacuum removes orphaned/replaced snapshots without disturbing
  *     the live version.
  */
class AtomicMartSpec extends SparkSpec {
  import spark.implicits._

  private def mart(day: String, rows: (String, Long, Long)*) =
    rows.toSeq.toDF("rule", "tx_id", "amount")
      .withColumn("batch_date", lit(day))

  test("publish + read round-trips one day across two rules") {
    val path = Files.createTempDirectory("graft_amart").toString
    val day1 = mart("2021-03-01",
      ("passport", 1L, 100L), ("passport", 2L, 200L), ("city", 3L, 300L))
    val v = AtomicMart.publishDay(day1, path)
    assert(v == 0L)
    val back = AtomicMart.read(spark, path)
    assert(back.count() == 3)
    assert(back.select("rule", "tx_id", "amount").as[(String, Long, Long)]
      .collect().toSet == Set(("passport", 1L, 100L), ("passport", 2L, 200L), ("city", 3L, 300L)))
    // partition columns restored from directory names
    assert(back.columns.toSet == Set("rule", "tx_id", "amount", "batch_date"))
  }

  test("snapshot isolation: reader bound to v0 survives a concurrent republish of v1") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    // Reader A binds NOW (resolves the v0 manifest at call time)...
    val readerA = AtomicMart.read(spark, path)
    // ...then the day is republished with corrected amounts (v1).
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 999L)), path)
    // A still sees all-old; a fresh reader sees all-new. Never a mix.
    assert(readerA.select("amount").as[Long].collect().toSeq == Seq(100L))
    assert(AtomicMart.read(spark, path).select("amount").as[Long].collect().toSeq == Seq(999L))
  }

  test("crash between stage and commit leaves the old version intact") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    // Simulated crash: the day-2 publish stages its snapshot fully,
    // then dies before the manifest rename.
    AtomicMart.stage(mart("2021-03-02", ("passport", 9L, 900L)), path,
      Seq("rule", "batch_date"))
    assert(AtomicMart.currentVersion(spark, path).contains(0L))
    val seen = AtomicMart.read(spark, path)
    assert(seen.count() == 1)
    assert(seen.select("tx_id").as[Long].collect().toSeq == Seq(1L))
    // The retry re-stages and commits; the orphan snapshot stays
    // invisible and is reclaimed by vacuum.
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 9L, 900L)), path)
    assert(AtomicMart.read(spark, path).count() == 2)
    val removed = AtomicMart.vacuum(spark, path)
    assert(removed.size == 1) // exactly the crashed stage's snapshot
    assert(AtomicMart.read(spark, path).count() == 2)
  }

  test("B31 time travel: every retained version reads back exactly; vacuum sets the horizon") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)   // v0
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 999L)), path)   // v1 (replaces)
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 2L, 200L)), path)   // v2 (adds a day)
    def amounts(v: Long) = AtomicMart.readVersion(spark, path, v)
      .select("amount").as[Long].collect().toSeq.sorted
    assert(amounts(0) == Seq(100L))
    assert(amounts(1) == Seq(999L))
    assert(amounts(2) == Seq(200L, 999L))
    assert(intercept[IllegalArgumentException](
      AtomicMart.readVersion(spark, path, 9L)).getMessage.contains("no committed version"))
    // vacuum keeps only snapshots the LATEST manifest references: v0's
    // replaced snapshot goes, v0 stops being readable, v2 is untouched
    AtomicMart.vacuum(spark, path)
    assert(amounts(2) == Seq(200L, 999L))
    assert(intercept[Exception](amounts(0)).getMessage != null)
  }

  test("empty publish: a zero-row batch commits a no-op version, retracts nothing") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    // a day with no fraud hits still publishes (the pipeline doesn't
    // special-case empty marts): new version, zero partitions staged,
    // every prior partition kept
    val v = AtomicMart.publishDay(
      mart("2021-03-02").limit(0), path)
    assert(v == 1L)
    assert(AtomicMart.read(spark, path).count() == 1)
    // and publishReplacing with an empty frame IS the retraction path
    AtomicMart.publishReplacing(
      mart("2021-03-01", ("passport", 1L, 100L)).limit(0), path,
      Seq("rule", "batch_date"), Seq(Seq("passport", "2021-03-01")))
    assert(AtomicMart.read(spark, path).count() == 0)
  }

  test("B32 shallow clone: zero-copy v0, then both sides evolve independently") {
    val src = Files.createTempDirectory("graft_amart").toString
    val dst = Files.createTempDirectory("graft_amart").toString + "/clone"
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), src)
    AtomicMart.shallowClone(spark, src, dst)
    assert(AtomicMart.read(spark, dst).select("amount").as[Long].collect().toSeq == Seq(100L))
    // no data directories were copied: the clone root holds no snapshots
    assert(!Files.exists(java.nio.file.Paths.get(dst, "data")))
    // diverge: a publish to the clone leaves the source untouched and
    // vice versa
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 2L, 200L)), dst)
    AtomicMart.publishDay(mart("2021-03-03", ("passport", 3L, 300L)), src)
    assert(AtomicMart.read(spark, dst).select("amount").as[Long].collect().toSet
      == Set(100L, 200L))
    assert(AtomicMart.read(spark, src).select("amount").as[Long].collect().toSet
      == Set(100L, 300L))
    // the clone's vacuum reclaims nothing borrowed: source still reads
    AtomicMart.vacuum(spark, dst)
    assert(AtomicMart.read(spark, src).count() == 2)
    assert(AtomicMart.read(spark, dst).count() == 2)
  }

  test("republish replaces only its own partitions; others keep old pointers") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01",
      ("passport", 1L, 100L), ("city", 2L, 200L)), path)
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 3L, 300L)), path)
    // Republish ONLY (passport, 03-01); city/03-01 and 03-02 untouched.
    AtomicMart.publishDay(
      mart("2021-03-01", ("passport", 1L, 111L), ("passport", 10L, 110L)), path)
    val rows = AtomicMart.read(spark, path)
      .select("rule", "tx_id", "amount").as[(String, Long, Long)].collect().toSet
    assert(rows == Set(
      ("passport", 1L, 111L), ("passport", 10L, 110L),
      ("city", 2L, 200L), ("passport", 3L, 300L)))
    // Manifest-pruned partition read: no directory outside `city` listed.
    val city = AtomicMart.readWhere(spark, path, "rule", "city")
    assert(city.select("tx_id").as[Long].collect().toSeq == Seq(2L))
    // vacuum is snapshot-granular: the first snapshot stays (city's
    // live pointer still targets it) and live rows are unchanged
    AtomicMart.vacuum(spark, path)
    assert(AtomicMart.read(spark, path).count() == 4)
  }
}
