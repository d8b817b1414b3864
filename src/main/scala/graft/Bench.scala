package graft

import org.apache.spark.sql.SparkSession

import graft.fraud.FraudRules

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Queries are driven through the `noop` datasource sink: every output
  * row is fully materialized (all columns evaluated, final sort
  * executed) without parquet-encode cost. A `count()` drive would let
  * Catalyst prune projections and final sorts, under-measuring map-only
  * queries — the noop write measures the plan users actually run.
  *
  * Errors are errors: a failing query is recorded under "errors" in the
  * JSON and the process exits non-zero. No fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Pid-private learned-cell export dir: a bench run must never
    // clobber the cell snapshot a pending Verify/oracle check reads.
    if (sys.props.get("graft.cells.dir").isEmpty)
      System.setProperty("graft.cells.dir",
        s"/tmp/graft_bench_cells_${ProcessHandle.current().pid()}")
    if (sys.props.get("graft.scratch.dir").isEmpty)
      System.setProperty("graft.scratch.dir",
        s"/tmp/graft_bench_scratch_${ProcessHandle.current().pid()}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Watchdog per drive: a single wedged query (e.g. an AQE hang under
    // co-tenant noise) must not hang the whole benchmark. The drive runs
    // on a worker thread inside a cancellable job group; on timeout the
    // group is cancelled, the worker interrupted, and the query recorded
    // as an error.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_TIMEOUT", "240").toLong
    def drive(name: String): Unit = {
      @volatile var failure: Throwable = null
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        } catch { case t: Throwable => failure = t }
        finally spark.sparkContext.clearJobGroup()
      }, s"bench-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000L)
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(s"bench-$name")
        worker.interrupt()
        worker.join(10000L)
        throw new RuntimeException(s"timed out after ${timeoutSec}s")
      }
      if (failure != null) throw failure
    }

    // JVM/codegen warm-up on a small scan so the first measured query
    // doesn't pay JIT + classloading. Best-effort: a warm-up failure
    // surfaces again (and gets recorded) in the measured passes.
    try drive("q1_agg") catch { case _: Throwable => }

    // min of three INTERLEAVED passes: the box is shared and noise is
    // bursty (up to 3x for ~30s windows — SURVEY §6). Back-to-back
    // repeats of one query both land inside the same burst; spreading a
    // query's runs across full passes lets its min come from whichever
    // pass was quiet.
    // Optional trailing args filter to a subset (dev loop); the driver
    // invokes with no args and benches everything.
    val names =
      if (args.nonEmpty) args.toSeq.sorted.filter(SparkEntry.queries.contains)
      else SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Pass count knob: 3 interleaved passes by default; large-SF runs
    // can drop to 1-2 to bound wall-clock.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    for (_ <- 1 to passes; name <- names if !errors.contains(name)) {
      val t0 = System.nanoTime()
      try {
        drive(name)
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best.getOrElse(name, Double.MaxValue)) best(name) = t
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(1).mkString
        best.remove(name)
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      // ContextCleaner reaps dead checkpoint/broadcast/shuffle state
      // only after the driver GC collects the owning objects; with a
      // 24 GB heap a full GC may never happen on its own, so a long
      // sweep accumulates hundreds of dead blocks and later queries
      // pay the memory pressure (outside the timed region here).
      System.gc()
    }
    val results = names.flatMap(n => best.get(n).map(n -> _))
    FraudRules.unpersistAll()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Stdout tail-capture truncated BENCH_r03.json (lost the first 9
    // queries + total); persist the full line to a file as the durable
    // artifact regardless of how much of stdout survives.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
