package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic two-day snapshot analog of the reference's daily
  * terminal files (terminals_0X032021.xlsx): day-1 is the `part` table
  * recast as a terminal dimension; day-2 drops every 19th key (deletes),
  * rewrites the city of every 7th (changes), and appends shifted copies
  * of every 23rd (inserts). Both engines can derive the exact same
  * snapshots, which makes the full SCD2 merge oracle-checkable.
  */
object Scd2Snapshots {
  val Key = "terminal_id"
  val Attrs = Seq("terminal_type", "terminal_city", "terminal_address")
  val Day1 = "2024-03-01"
  val Day2 = "2024-03-02"

  def day1(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("terminal_id"),
      col("p_brand").as("terminal_type"),
      col("p_type").as("terminal_city"),
      col("p_name").as("terminal_address"))

  def day2(s: SparkSession, d: String): DataFrame = {
    val base = day1(s, d)
    val survivors = base
      .filter(col("terminal_id") % 19 =!= 0)
      .withColumn("terminal_city",
        when(col("terminal_id") % 7 === 0, concat(col("terminal_city"), lit(" UPD")))
          .otherwise(col("terminal_city")))
    val arrivals = base
      .filter(col("terminal_id") % 23 === 0)
      .withColumn("terminal_id", col("terminal_id") + 1000000L)
    survivors.unionByName(arrivals)
  }
}
