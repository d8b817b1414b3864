package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the testdata star schema.
  *
  * Mirrors the reference DWH's table surface
  * (/root/reference/sql_project-master/sql_scripts/DWH_tables.sql) on the
  * driver-generated TPC-H-ish tables. Loaders return raw scans — callers
  * `select` the columns they need so Catalyst prunes the parquet
  * `ReadSchema` (at 100 TB a full-width scan is the first thing to kill).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Events = the transaction-stream analog (reference
    * DWH_FACT_TRANSACTIONS). The parquet's `ts` physical type has varied
    * across testdata generations — ns-precision INT64 (readable only as a
    * raw long under `nanosAsLong`) or µs-precision timestamp (surfacing as
    * TIMESTAMP_NTZ). We normalize both flavors to:
    *   - `ts_us`  epoch microseconds BIGINT (== DuckDB `epoch_us(ts)`;
    *     the session timezone is UTC so NTZ wall-clock == UTC instant,
    *     matching DuckDB's naive-timestamp convention) — the canonical
    *     event time for all arithmetic; exact integers survive any
    *     engine's precision rules.
    *   - `ts_t`   TimestampType for window / date functions.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // GraftSession declares this at construction; guard for sessions
    // built elsewhere (tests, notebooks) rather than re-setting per call.
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ != "true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below is instant-preserving only under a
    // UTC session; a non-UTC session (ad-hoc notebook) would silently
    // shift ts_us by the zone offset and break DuckDB epoch_us parity.
    // Fail fast instead of mutating the caller's session (a reader
    // must not change the semantics of unrelated timestamp
    // expressions in a session that deliberately set another zone) —
    // GraftSession.builder declares UTC, like the nanosAsLong flag.
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      throw new IllegalStateException(
        "events() requires spark.sql.session.timeZone=UTC (the NTZ " +
          "instant cast is zone-sensitive and oracle parity assumes " +
          "UTC). Build the session via GraftSession, or set the conf " +
          "yourself — the reader will not mutate your session.")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        val t = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts_us", unix_micros(t)).withColumn("ts_t", t)
      case other =>
        // fail fast: a future testdata generation with e.g. string or
        // integer-seconds ts must not silently coerce into wrong values
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other " +
            "(expected INT64 nanos or µs timestamp)")
    }
  }
}
