package graft

/** Dev plan-audit main: executes the named queries at a small sf and
  * prints the FINAL adaptive physical plan plus the shape counters the
  * plan audits in docs/PLANS.md track (exchanges, join strategies,
  * cartesians). Usage:
  *   sbt "runMain graft.Explain <sfDir> q_x [q_y ...]"   (full plan)
  *   SPARK_GRAFT_EXPLAIN_SUMMARY=1 ... (counters only)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val summaryOnly = sys.env.contains("SPARK_GRAFT_EXPLAIN_SUMMARY")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // finalize the adaptive plan WITHOUT pulling the result set onto
      // the driver. NOT df.write(noop): that wraps the plan in a NEW
      // QueryExecution and leaves THIS df's AQE plan un-finalized
      // (isFinalPlan=false — the audit would read the initial plan).
      // Counting the df's own toRdd executes the same QueryExecution
      // the counters below are read from, shipping one long per
      // partition instead of the result set.
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val driveSec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      def n(s: String) = plan.linesIterator.count(_.contains(s))
      println(f"== $name: drive_s=$driveSec%.2f exchanges=${n("Exchange")} " +
        s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"shj=${n("ShuffledHashJoin")} cartesian=${n("Cartesian")} " +
        s"codegen_ops=${n("*(")}") // `*(id)` marks whole-stage-codegen'd operators
      if (!summaryOnly) println(plan)
    }
    spark.stop()
  }
}
