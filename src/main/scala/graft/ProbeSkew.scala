package graft

/** Dev skew-join probe (same dev-only status as [[Explain]]): runs a
  * named suite query on a Zipf-skewed tier with AQE skew-split
  * thresholds scaled DOWN to the tier's partition sizes, then reports
  * whether the final adaptive plan actually split a skewed partition
  * (`skew=true` markers on the shuffle reads / sort-merge joins).
  *
  * Why the threshold override is honest: AQE's defaults
  * (skewedPartitionThresholdInBytes=256 MB, advisory 64 MB) are sized
  * for production shuffles. At the test tier a hot Zipf key owns the
  * same RELATIVE share of its shuffle as it would at 100 TB, but the
  * absolute partition is a few MB — below the default trigger. Scaling
  * both thresholds down by the same factor reproduces the 100 TB
  * decision geometry; the PLAN SHAPE (which join splits, and that
  * results stay correct) is what this probe pins.
  *
  * Partition count matters as much as the byte thresholds: a hot key
  * owning 2% of a stream is invisible among 16 fat partitions (every
  * partition holds ~6%) but dominates its partition 10× over when the
  * shuffle is cut to cluster-scale partition counts — the 100 TB
  * regime, where thousands of partitions make the median tiny and the
  * hot key's partition the straggler. The probe therefore runs with a
  * production-shaped partition count, not the test default.
  *
  * Usage: sbt "runMain graft.ProbeSkew <sfDir> <query> [thresholdKb=512] [partitions=512]"
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val thresholdKb = if (args.length > 2) args(2).toLong else 512L
    val partitions = if (args.length > 3) args(3).toInt else 512
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", partitions)
      .config("spark.ui.enabled", "false")
      // allow the split even when a downstream stage must re-shuffle:
      // the suite's analytic queries re-key after their joins, and
      // without force AQE conservatively keeps the skewed partition
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        s"${thresholdKb}k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${thresholdKb}k")
      // at 100 TB the big sides of these joins exceed any broadcast
      // budget; pinning the threshold low reproduces that plan shape
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // a skewed REDUCE partition can only split along MAP-task block
      // boundaries; a tier-sized table read as one map block is
      // unsplittable no matter how skewed (observed: left max 135 KB
      // vs median 6.7 KB detected, 0 partitions split). At 100 TB the
      // scan runs thousands of map tasks; scale maxPartitionBytes down
      // with everything else to reproduce that geometry.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface OptimizeSkewedJoin's size diagnostics when debugging
    if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    // "__micro": the ScaleSpec synthetic shape, to isolate config vs
    // query effects when debugging why a split did/didn't fire
    val df = if (name.startsWith("__micro")) {
      import org.apache.spark.sql.functions._
      val skewed = spark.range(300000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val oth = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = skewed.join(oth, Seq("k"))
      name match {
        case "__micro" => j
        case "__micro_agg" => // downstream re-keyed exchange, like q_attribution
          j.groupBy(col("w")).agg(sum(col("v")).as("sv"))
        case "__micro_cond" => // extra non-equi condition on the SMJ
          skewed.join(oth, skewed("k") === oth("k") && skewed("v") < oth("w") * 1000000L)
      }
    } else SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    val skewMarks = plan.linesIterator.count(_.contains("skew=true"))
    def n(s: String) = plan.linesIterator.count(_.contains(s))
    println(s"PROBE_SKEW query=$name skew_marks=$skewMarks " +
      s"smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} " +
      s"bhj=${n("BroadcastHashJoin")} aqeRead=${n("AQEShuffleRead")}")
    plan.linesIterator
      .filter(l => l.contains("skew=true") || l.contains("AQEShuffleRead") ||
        l.contains("SortMergeJoin") || l.contains("Exchange"))
      .take(20).foreach(l => println("  " + l.trim.take(200)))
    sys.env.get("SPARK_GRAFT_PLAN_OUT")
      .foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), plan))
    spark.stop()
  }
}
