package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicMart, MartSql}

/** B45 — ALTER TABLE SQL skin: the three lake-standard statements map
  * onto the engine DDL calls with identical guards; anything else is
  * refused whole. */
class MartSqlSpec extends SparkSpec {
  import spark.implicits._

  private def mart(day: String, rows: (String, Long, Long)*) =
    rows.toSeq.toDF("rule", "tx_id", "amount")
      .withColumn("batch_date", lit(day))

  test("RENAME / ADD / DROP round-trip through SQL strings") {
    val path = Files.createTempDirectory("graft_martsql").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)

    // rename (auto-enables column mapping, same as the API call)
    MartSql.exec(spark, s"ALTER TABLE '$path' RENAME COLUMN amount TO amount_cents")
    assert(AtomicMart.read(spark, path).columns.contains("amount_cents"))

    // add with a parameterized DDL type; keywords case-insensitive
    MartSql.exec(spark, s"alter table $path add column region DECIMAL(38,0)")
    assert(AtomicMart.read(spark, path).columns.contains("region"))

    // drop; trailing semicolon tolerated
    MartSql.exec(spark, s"ALTER TABLE '$path' DROP COLUMN region;")
    assert(!AtomicMart.read(spark, path).columns.contains("region"))

    // the data survived the whole migration chain
    assert(AtomicMart.read(spark, path)
      .select("rule", "tx_id", "amount_cents")
      .as[(String, Long, Long)].collect().toSeq == Seq(("passport", 1L, 100L)))
  }

  test("the engine guards hold identically through the SQL skin") {
    val path = Files.createTempDirectory("graft_martsql_guard").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    // reserved generated-physical pattern refused (ADVICE r12 guard)
    intercept[IllegalArgumentException](
      MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN _gc7 STRING"))
    // burned-tombstone re-add refused after DROP on an unmapped table
    MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN note STRING")
    MartSql.exec(spark, s"ALTER TABLE '$path' DROP COLUMN note")
    intercept[IllegalArgumentException](
      MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN note STRING"))
  }

  test("ADD COLUMN cannot smuggle a second field through the DDL type (ADVICE r13)") {
    val path = Files.createTempDirectory("graft_martsql_smuggle").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    val before = AtomicMart.currentVersion(spark, path)
    // fromDDL parses "STRING, dropped BIGINT" into TWO fields; only the
    // first ran through the guards — the second would land unguarded
    // (on this unmapped table, bypassing the resurrection tombstone)
    val e = intercept[IllegalArgumentException](
      MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN a STRING, dropped BIGINT"))
    assert(e.getMessage.contains("exactly one column"))
    // refused WHOLE: no commit, neither column appeared
    assert(AtomicMart.currentVersion(spark, path) == before)
    assert(!AtomicMart.read(spark, path).columns
      .exists(Set("a", "dropped").contains))
    // same guard on the direct API and on the MAPPED-table branch
    intercept[IllegalArgumentException](
      AtomicMart.addColumn(spark, path, "b", "STRING, smuggled BIGINT"))
    MartSql.exec(spark, s"ALTER TABLE '$path' RENAME COLUMN amount TO amount_cents")
    intercept[IllegalArgumentException](
      MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN c STRING, smug2 BIGINT"))
    assert(!AtomicMart.read(spark, path).columns
      .exists(Set("b", "smuggled", "c", "smug2").contains))
  }

  test("VACUUM / OPTIMIZE statements map onto the engine maintenance API with its safe defaults (VERDICT r13 #6)") {
    val path = Files.createTempDirectory("graft_martsql_maint").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path) // v0
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 200L)), path) // v1
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 300L)), path) // v2

    // RETAIN 2 VERSIONS: the readability horizon moves NOW (v0 loudly
    // gone) while the head and v1 stay whole; the 24h concurrent-writer
    // grace stays in force — the skin has no graceMs syntax by design
    val v = MartSql.exec(spark, s"VACUUM '$path' RETAIN 2 VERSIONS")
    assert(v == 2L) // vacuum commits nothing: unchanged head version
    assert(AtomicMart.readVersion(spark, path, 2L)
      .select("amount").as[Long].collect().toSeq == Seq(300L))
    assert(AtomicMart.readVersion(spark, path, 1L)
      .select("amount").as[Long].collect().toSeq == Seq(200L))
    intercept[IllegalArgumentException](AtomicMart.readVersion(spark, path, 0L).collect())

    // default retain = 1; keywords case-insensitive, semicolon tolerated
    MartSql.exec(spark, s"vacuum '$path';")
    intercept[IllegalArgumentException](AtomicMart.readVersion(spark, path, 1L).collect())

    // the engine guard fires through the skin before any deletion
    intercept[IllegalArgumentException](
      MartSql.exec(spark, s"VACUUM '$path' RETAIN 0 VERSIONS"))

    // OPTIMIZE = compact under the manifest: bin-packs a fragmented
    // partition into a NEW committed version with identical rows
    AtomicMart.publishDay(
      mart("2021-03-02", (1L to 8L).map(i => ("passport", i, i * 100L)): _*)
        .repartition(8), path) // v3: 8 files in one partition
    val v2 = MartSql.exec(spark, s"OPTIMIZE '$path'")
    assert(v2 == 4L)
    assert(AtomicMart.read(spark, path).count() == 9L)
    // already compact now: a no-op returning the same head, no commit
    assert(MartSql.exec(spark, s"OPTIMIZE '$path'") == 4L)

    // Delta's time-based retention shape is refused WHOLE, not lossily
    // mapped onto version counts; so is any decorated OPTIMIZE
    val before = AtomicMart.currentVersion(spark, path)
    for (bad <- Seq(
      s"VACUUM '$path' RETAIN 168 HOURS",
      s"VACUUM '$path' DRY RUN",
      s"OPTIMIZE '$path' ZORDER BY (amount)")) {
      intercept[IllegalArgumentException](MartSql.exec(spark, bad))
    }
    assert(AtomicMart.currentVersion(spark, path) == before)
  }

  test("anything outside the grammar is refused whole, never half-run") {
    val path = Files.createTempDirectory("graft_martsql_bad").toString
    AtomicMart.publishDay(mart("2021-03-01", ("passport", 1L, 100L)), path)
    val before = AtomicMart.currentVersion(spark, path)
    for (bad <- Seq(
      s"DROP TABLE '$path'",
      s"ALTER TABLE '$path' RENAME TO other",
      s"ALTER TABLE '$path' ALTER COLUMN amount TYPE STRING",
      "not sql at all"))
      intercept[IllegalArgumentException](MartSql.exec(spark, bad))
    // a bad DDL type is refused by the eager type validation
    intercept[Exception](
      MartSql.exec(spark, s"ALTER TABLE '$path' ADD COLUMN x NOTATYPE"))
    assert(AtomicMart.currentVersion(spark, path) == before) // head unmoved
  }
}
