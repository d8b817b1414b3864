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
      // Long-session hygiene: the status stores retain per-execution
      // state (including full AQE plan strings — megabytes each at
      // scale) for a UI this engine's batch sessions never serve.
      // Default retention (1000 executions) made a 154-query sweep
      // degrade measurably from driver-heap pressure alone: hot
      // queries ran 4-7x slower late in the session than isolated
      // (q_sparse_sim 85 s in-suite vs 18 s isolated at the 10x tier)
      // until retention was bounded. A monitored production deployment
      // raises these consciously; unbounded-by-default is the wrong
      // posture for a long-lived session.
      // The codegen class cache defaults to 100 entries — a 242-query
      // session generates far more distinct whole-stage classes than
      // that, so interleaved sweeps thrash the cache and EVERY pass
      // pays janino recompilation for every query. Static conf (read
      // once at first codegen), scale-independent: any long-lived
      // multi-query session wants its working set of generated classes
      // resident. ~50 KB/class; thousands fit comfortably in metaspace.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
}
