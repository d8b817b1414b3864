package graft

import org.apache.spark.sql.functions._

import graft.sources.Compaction

/** Driver/executor-bound probe for the two remaining driver-sized
  * structures (VERDICT r7 #6): B17's compaction plan (file-COUNT-sized
  * driver work) and E47's per-term posting rows (df-capped executor
  * aggregation buffers). Prints one PROBE line per scenario with wall
  * time and measured heap; asserts the packing invariants loudly.
  *
  * Run: sbt "runMain graft.ProbeDriverBounds"
  */
object ProbeDriverBounds {

  private def usedHeapMb(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val target = 128L * 1024 * 1024

    // ---- B17: 1M and 5M file entries, two adversarial shapes ----
    // "unpairable": every file is 0.9×target → every file its own bin
    // (the bin-count worst case that wedged the O(n·bins) FFD);
    // "mixed": seeded LCG sizes across 1–127 MB (realistic straggler mix).
    for (n <- Seq(1000000, 5000000); shape <- Seq("unpairable", "mixed")) {
      var seed = 0x9E3779B97F4A7C15L
      def nextLong(): Long = { seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17; seed }
      val files = (0 until n).map { i =>
        val sz = shape match {
          case "unpairable" => (target * 9) / 10
          case _ => 1024L * 1024 * (1 + math.floorMod(nextLong(), 127L))
        }
        (f"file:/lake/t/part-$i%08d.parquet", sz)
      }
      val h0 = usedHeapMb()
      val t0 = System.nanoTime()
      val plan = Compaction.pack(files, target)
      val wallMs = (System.nanoTime() - t0) / 1000000
      val h1 = usedHeapMb()
      // invariants: every file placed exactly once, bins within target
      val placed = plan.bins.iterator.map(_.files.size).sum + plan.skipped.size
      assert(placed == n, s"pack lost files: $placed of $n")
      assert(plan.bins.forall(_.bytes <= target), "bin over target")
      val binned = plan.bins.iterator.map(_.bytes).sum
      val smallSum = files.iterator.filter(_._2 < target).map(_._2).sum
      assert(binned == smallSum, "byte mass not conserved")
      println(s"PROBE_B17 shape=$shape files=$n bins=${plan.bins.size} " +
        s"wall_ms=$wallMs heap_before_mb=$h0 heap_after_mb=$h1")
    }

    // ---- E47: posting rows at the df-cap boundary ----
    val spark = GraftSession.builder("local[8]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000000L
    // "hot" in every doc (over the 78% ppm gate → stop-listed);
    // "warm" in 77.9% of docs (just UNDER the gate → the boundary row);
    // "u<id>" unique per doc (vocabulary mass).
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("hot "),
        when(col("id") % 1000 < 779, lit("warm ")).otherwise(lit("")),
        lit("u"), col("id").cast("string")).as("text"))
    for ((cap, label) <- Seq(Long.MaxValue -> "relative_gate_only",
                             1000000L -> "absolute_cap_1m")) {
      val t0 = System.nanoTime()
      val idx = graft.ops.TextAnalysis.invertedIndex(docs, maxPostings = cap)
        .select(col("term"), col("df"),
          when(col("postings") === "", 0L)
            .otherwise(size(split(col("postings"), ",")).cast("long")).as("n_postings"))
      val hot = idx.filter(col("term") === "hot").collect()(0)
      val warm = idx.filter(col("term") === "warm").collect()(0)
      val maxPost = idx.agg(max(col("n_postings"))).collect()(0).getLong(0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      println(s"PROBE_E47 mode=$label docs=$n hot_df=${hot.getLong(1)} " +
        s"hot_postings=${hot.getLong(2)} warm_df=${warm.getLong(1)} " +
        s"warm_postings=${warm.getLong(2)} max_postings=$maxPost " +
        s"wall_ms=$wallMs heap_mb=${usedHeapMb()}")
      // the guards: over-ppm always empty; over-absolute-cap empty too
      assert(hot.getLong(2) == 0L, "over-ppm term kept a posting list")
      if (cap == 1000000L)
        assert(warm.getLong(2) == 0L, "absolute cap did not stop-list the boundary term")
      else
        assert(warm.getLong(2) == warm.getLong(1), "boundary term list incomplete")
    }
    spark.stop()
  }
}
