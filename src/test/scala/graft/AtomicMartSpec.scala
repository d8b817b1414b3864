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
    // exactly the crashed stage's snapshot (plus the aged-out manifest)
    assert(removed.count(_.contains("/data/")) == 1)
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

  test("OCC: two concurrent publishers to disjoint partitions both land, versions linearize") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path) // v0
    // Two writers race: both stage, both try to commit v1. The loser
    // must REBASE onto the winner and land as v2 — neither batch lost.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def racer(day: String, txId: Long) = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = {
        val (_, entries) = AtomicMart.stage(
          mart(day, ("passport", txId, txId * 10)), path, Seq("rule", "batch_date"))
        gate.await(10, TimeUnit.SECONDS) // both staged; commit simultaneously
        AtomicMart.commit(spark, path, entries, Seq("rule", "batch_date"))
      }
    })
    val (fa, fb) = (racer("2021-03-02", 2L), racer("2021-03-03", 3L))
    gate.countDown()
    val (va, vb) = (fa.get(60, TimeUnit.SECONDS), fb.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(Set(va, vb) == Set(1L, 2L), s"versions must linearize, got $va/$vb")
    assert(AtomicMart.currentVersion(spark, path).contains(2L))
    // no entry lost: the head manifest carries all three days
    assert(AtomicMart.read(spark, path).select("tx_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
    // and history is coherent: v1 = base + the v1 winner only
    assert(AtomicMart.readVersion(spark, path, 1L).count() == 2)
  }

  test("OCC: same-partition concurrent replace is a loud conflict, not a silent winner") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path) // v0
    // Writer A stages a replacement of (passport, 03-01)...
    val (_, entriesA) = AtomicMart.stage(
      mart("2021-03-01", ("passport", 1L, 111L)), path, Seq("rule", "batch_date"))
    // ...writer B replaces the SAME partition and commits first (v1).
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 222L)), path)
    // A's commit declares the snapshot it read (v0), sees its partition
    // changed since, refuses.
    val e = intercept[AtomicMart.PartitionConflictException] {
      AtomicMart.commit(spark, path, entriesA, Seq("rule", "batch_date"),
        baseVersion = Some(0L))
    }
    assert(e.getMessage.contains("passport"))
    // B's publish is intact
    assert(AtomicMart.read(spark, path).select("amount").as[Long].collect().toSeq
      == Seq(222L))
  }

  test("vacuum retention window: v(n-1) readable, v(n-2) loudly gone, head untouched") {
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path) // v0
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 200L)), path) // v1
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 300L)), path) // v2
    AtomicMart.vacuum(spark, path, retainLast = 2)
    def amount(v: Long) = AtomicMart.readVersion(spark, path, v)
      .select("amount").as[Long].collect().toSeq
    assert(amount(2L) == Seq(300L)) // head untouched
    assert(amount(1L) == Seq(200L)) // v(n-1) inside the window: still whole
    val e = intercept[IllegalArgumentException](amount(0L))
    assert(e.getMessage.contains("no committed version")) // v(n-2): loud, not corrupt
  }

  test("JSON-hostile partition values round-trip through the manifest") {
    val path = Files.createTempDirectory("graft_amart").toString
    // '}', '],"dir"' and quotes/backslashes are exactly what broke the
    // old regex splitter; values are user data so all must survive
    val hostile = Seq("""a}b"c\d""", """x],"dir"y""", "tab\there")
    val rows = hostile.zipWithIndex.map { case (r, i) => (r, i.toLong, 100L * i) }
    AtomicMart.publishDay(mart("2021-03-01", rows: _*), path)
    val back = AtomicMart.read(spark, path)
    assert(back.select("rule").as[String].collect().toSet == hostile.toSet)
    // manifest-pruned read still resolves each hostile value exactly
    hostile.foreach { r =>
      assert(AtomicMart.readWhere(spark, path, "rule", r).count() == 1, s"value <$r>")
    }
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

  test("B38 table constraints: violating publish refused pre-stage, table untouched") {
    import graft.etl.Checks
    import graft.sources.MartConstraints
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    MartConstraints.set(spark, path, Seq(
      Checks.NotNull("c_rule", "rule"),
      Checks.Bounds("c_amount", col("amount"), 0L, 1000L),
      Checks.Unique("c_pk", Seq("tx_id"))))
    // good batch passes through every commit path's shared funnel
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 2L, 500L)), path)
    assert(AtomicMart.read(spark, path).count() == 2)
    // bounds + uniqueness violations: refused, loudly, naming both
    val bad = mart("2021-03-03", ("passport", 7L, 5000L), ("city", 7L, 10L))
    val ex = intercept[MartConstraints.ConstraintViolationException] {
      AtomicMart.publishDay(bad, path)
    }
    assert(ex.getMessage.contains("c_amount")
      && ex.getMessage.contains("c_pk"), ex.getMessage)
    // the refusal is PRE-stage: version head unmoved, rows unchanged,
    // and no orphan snapshot was even written
    assert(AtomicMart.currentVersion(spark, path).contains(1L))
    assert(AtomicMart.read(spark, path).count() == 2)
    // non-declarative checks cannot become table constraints
    intercept[IllegalArgumentException] {
      MartConstraints.set(spark, path,
        Seq(Checks.Predicate("c_pred", col("amount") > 0L)))
    }
    // clearing the suite re-opens the gate
    MartConstraints.clear(spark, path)
    AtomicMart.publishDay(bad, path)
    assert(AtomicMart.read(spark, path).count() == 4)
  }

  test("B38 declaration scans existing data and Unique holds TABLE-wide, not per-batch") {
    import graft.etl.Checks
    import graft.sources.MartConstraints
    val path = Files.createTempDirectory("graft_amart").toString
    AtomicMart.publishDay(
      mart("2021-03-01", ("passport", 1L, 100L), ("passport", 2L, 5000L)), path)
    // (a) ADD CONSTRAINT semantics: existing data violates the bound →
    // declaration refused, nothing installed, later publishes unchecked
    val exSet = intercept[MartConstraints.ConstraintViolationException] {
      MartConstraints.set(spark, path, Seq(
        Checks.Bounds("c_amount", col("amount"), 0L, 1000L)))
    }
    assert(exSet.getMessage.contains("c_amount"), exSet.getMessage)
    assert(MartConstraints.get(spark, path).isEmpty)
    // (b) a name Checks.run would refuse is refused at DECLARATION
    intercept[IllegalArgumentException] {
      MartConstraints.set(spark, path,
        Seq(Checks.NotNull("bad`name\"", "rule")))
    }
    // (c) a suite the current data satisfies installs fine
    MartConstraints.set(spark, path, Seq(Checks.Unique("c_pk", Seq("tx_id"))))
    // (d) CROSS-batch duplicate: tx_id 1 is already live in an earlier
    // batch; a new APPENDING publish carrying it again must refuse —
    // uniqueness is a property of the table, not of one batch
    val exDup = intercept[MartConstraints.ConstraintViolationException] {
      AtomicMart.publishDay(mart("2021-03-02", ("passport", 1L, 50L)), path)
    }
    assert(exDup.getMessage.contains("c_pk")
      && exDup.getMessage.contains("already live"), exDup.getMessage)
    assert(AtomicMart.read(spark, path).count() == 2)
    // (e) genuinely new keys append through the same gate
    AtomicMart.publishDay(mart("2021-03-02", ("passport", 3L, 50L)), path)
    assert(AtomicMart.read(spark, path).count() == 3)
    // (f) a REPLACE of a live partition restages its own keys without
    // self-colliding (the merge/erasure path): day 1 rewritten minus
    // tx 2, keeping tx 1 — allowed, because day 1's partitions are
    // retracted by the same commit
    val rewritten = mart("2021-03-01", ("passport", 1L, 100L))
    AtomicMart.publishReplacing(rewritten, path, Seq("rule", "batch_date"),
      Seq(Seq("passport", "2021-03-01")))
    val left = AtomicMart.read(spark, path).select("tx_id").as[Long].collect().toSet
    assert(left == Set(1L, 3L))
  }
}
