package graft

/** Dev tool: print the formatted physical plan of named queries.
  * Usage: runMain graft.Explain <sfDir> [--exec] <queryName> [queryName...]
  * With --exec, the query is materialized first and the FINAL adaptive
  * plan is printed (shows AQE runtime decisions: reused exchanges,
  * broadcast demotions, coalesced partitions). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val exec = args.tail.contains("--exec")
    val names = args.tail.filterNot(_ == "--exec")
    val spark = GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
