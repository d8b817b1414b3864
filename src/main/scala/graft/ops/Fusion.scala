package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E49 — reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR
  * '09): the standard hybrid-retrieval combiner — fuse k ranked lists
  * (here E39's lexical BM25 and E5's semantic cosine) by summing
  * 1/(K + rank) per item, K = 60 per the paper. RRF deliberately uses
  * only RANKS, never the incomparable raw scores, which is also what
  * makes it cross-engine exact here: each contribution is the integer
  * 10^6 div (K + rank), so the fused score hash-verifies as long as
  * the input rankings replay (they do — both feeding queries are
  * hash-green oracles themselves).
  *
  * Scale shape: inputs are top-k rankings — workload-sized
  * (queries × k × lists), never corpus-sized; one union, one grouped
  * sum, one per-query window. At 100 TB the expensive work lives in
  * the upstream retrievers; fusion is free by comparison.
  */
object Fusion {

  /** Fuse rankings with columns (q_id, item_id, rnk); ties on the
    * fused score break on item_id so the output order is total. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10,
              rrfK: Long = 60L): DataFrame = {
    val all = rankings
      .map(_.select(col("q_id"), col("item_id"), col("rnk")))
      .reduce(_ unionByName _)
    val fused = all
      .select(col("q_id"), col("item_id"),
        expr(s"1000000 div ($rrfK + rnk)").as("contrib"))
      .groupBy(col("q_id"), col("item_id"))
      .agg(sum(col("contrib")).as("rrf_u"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_u").desc, col("item_id"))
    fused
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .orderBy(col("q_id"), col("rnk"))
  }
}
