package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this engine assumes.
  * `shufflePartitions` should track cluster parallelism (32 locally;
  * thousands on a real cluster — it is THE knob that must scale with
  * data volume).
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries ns-precision INT64 timestamps, which the
      // parquet reader only accepts as raw longs under this flag; declared
      // here at session construction (Tables.events double-checks it for
      // sessions built elsewhere).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
