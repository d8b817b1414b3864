package graft

/** Dev tool: print the formatted physical plan of named queries.
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
