package graft
import org.apache.spark.sql.SparkSession
object DevExplain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q1_agg","q3_join","q5_join5","q_fraud_city","q_fraud_passport","q_events_bucket")) {
      println(s"########## $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Scan") || l.contains("Exchange") ||
        l.contains("Codegen") || l.contains("PushedFilters") || l.contains("Window") ||
        l.contains("HashAggregate")).map(_.take(220)).mkString("\n"))
    }
  }
}
