package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query key has a DuckDB twin in [[oracleSql]]; cross-engine
  * determinism rules are in SURVEY.md §5 (exact integer money, epoch-µs
  * timestamps, md5 as the only cross-engine hash).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D1: grouped aggregation, exact-integer money (TPC-H Q1 shape)
    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val base = cents(col("l_extendedprice"))
      val disc = lit(100L) - pct(col("l_discount"))
      val tax  = lit(100L) + pct(col("l_tax"))
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(LongType)).as("sum_qty"),
          sum(base).as("sum_base_cents"),
          sum(base * disc).as("sum_disc_cp"),
          sum(base * disc * tax).as("sum_charge_cpp"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- D10: time bucketing + multi-key agg on the event stream
    "q_events_bucket" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(col("ts_t"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("sum_value_cents"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type"))
    }),

    // ---- A3: JSON-in-column extraction (props → k → city bucket)
    "q_src_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .withColumn("city", col("k") % 5)
        .orderBy(col("event_id"))
    })
  )

  /** DuckDB twins, same column names/aliases as the Spark plans. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_cp,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_cpp,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_events_bucket" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_src_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS city
        |FROM events
        |ORDER BY event_id""".stripMargin
  )
}
