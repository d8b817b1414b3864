package graft

/** Dev measurement main for the optimization rounds: for each named
  * query, times the noop-sink drive (the Bench methodology — cold then
  * warm) at the bench core count and writes the FINAL adaptive plan as
  * `.explain("formatted")` text to `<outDir>/<query>_<suffix>.txt` —
  * the before/after evidence files the plan audits commit.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q_x [q_y ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (sys.props.get("graft.cells.dir").isEmpty)
      System.setProperty("graft.cells.dir",
        s"/tmp/graft_plandump_cells_${ProcessHandle.current().pid()}")
    if (sys.props.get("graft.scratch.dir").isEmpty)
      System.setProperty("graft.scratch.dir",
        s"/tmp/graft_plandump_scratch_${ProcessHandle.current().pid()}")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(3).foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump-$name")
      def drive(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = drive()
      val warm1 = drive()
      val warm2 = drive()
      // Plan capture: finalize THIS df's AQE plan by driving its own
      // QueryExecution (a noop write would wrap a fresh one and leave
      // this plan un-finalized), then print the formatted form.
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(f"PLAN $name cold=$cold%.2f warm=$warm1%.2f/$warm2%.2f -> $outDir/${name}_$suffix.txt")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
