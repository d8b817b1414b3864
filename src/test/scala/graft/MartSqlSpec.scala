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
