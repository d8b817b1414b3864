package graft

/** Dev budget-edge probe for the E41 exact prefix join (same dev-only
  * status as [[Explain]]): runs [[graft.ops.PrefixJoin.jaccardJoin]]
  * against a documents dir with an explicit candidate budget and
  * reports either the completed pair count or the fail-fast abort —
  * the artifact VERDICT r6 #4 asks for: prove the guarded path is
  * driver-safe AT the budget boundary on a default-sized heap, and
  * that the abort fires just above it.
  *
  * Usage: SPARK_DRIVER_MEM=8g sbt "runMain graft.ProbeE41 <docsDir> <maxCandidates>"
  *   maxCandidates = 1 → prints the corpus's candidate bound from the
  *   abort message (the cheap way to measure it).
  */
object ProbeE41 {
  def main(args: Array[String]): Unit = {
    val Array(dir, budget) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = sources.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    try {
      val n = ops.PrefixJoin.jaccardJoin(docs, maxCandidates = budget.toLong)
        .count()
      val heapMb = (Runtime.getRuntime.totalMemory() -
        Runtime.getRuntime.freeMemory()) / (1024 * 1024)
      println(s"PROBE_OK pairs=$n wall_s=${(System.nanoTime() - t0) / 1e9}" +
        s" used_heap_mb=$heapMb max_heap_mb=${Runtime.getRuntime.maxMemory() / (1024 * 1024)}")
    } catch {
      case e: IllegalStateException =>
        println(s"PROBE_ABORT wall_s=${(System.nanoTime() - t0) / 1e9} msg=${e.getMessage}")
    }
    spark.stop()
  }
}
