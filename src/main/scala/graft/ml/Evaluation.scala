package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators in exact integer space — the metrics a
  * training pipeline computes at corpus scale over classifier scores
  * (here the E46 hashed scorer; any integer score column works).
  *
  * Both avoid the naive global row sort: scores are contracted to
  * DISTINCT values first (the D46/D49 count-of-counts discipline), so
  * the only ordered work runs over the distinct-score frame — bounded
  * by score cardinality, not corpus size.
  */
object Evaluation {

  /** H4 — exact AUC via the rank-sum (Mann-Whitney U) identity:
    * AUC = (Σ avg-rank of positives − nPos(nPos+1)/2) / (nPos·nNeg),
    * ties handled by average rank. Doubling ranks keeps everything
    * integral: a tie group occupying positions [cum+1, cum+n] has
    * 2·avgRank = 2·cum + n + 1, so U·2 and the final ppm are exact —
    * bit-identical cross-engine, no floats anywhere.
    *
    * Scale shape: one groupBy contracts the corpus to distinct scores
    * with (n, n_pos); the rank prefix-sum window runs over THAT frame
    * only. Exact while nPos·nNeg·10^6 fits a long — beyond ~3·10^9
    * scored rows, stratify (per-slice AUC) before this op. */
  def aucExact(scored: DataFrame, score: String = "score",
               label: String = "label"): DataFrame = {
    val byScore = scored.groupBy(col(score).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(label)).as("np"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum") + col("n") + lit(1L)))
          .as("sum_r2"))
      .select(col("n_pos"), col("n_neg"),
        expr("(sum_r2 - n_pos * (n_pos + 1)) * 500000 div (n_pos * n_neg)")
          .as("auc_ppm"))
  }

  /** H5 — calibration curve (reliability diagram): fixed-width score
    * bins with observed positive rate per bin. One map-side bin
    * assignment + one grouped aggregation — no window at all. Scores
    * are SHIFTED non-negative before binning: Spark's `div` truncates
    * toward zero while DuckDB's `//` floors, so negative-score bins
    * would disagree cross-engine; after the shift both floor. */
  def calibration(scored: DataFrame, score: String = "score",
                  label: String = "label", binWidth: Long = 500L,
                  shift: Long = 1000000000L): DataFrame =
    scored
      .withColumn("bin",
        expr(s"(($score + $shift) div $binWidth) * $binWidth - $shift"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col(label)).as("n_pos"),
        sum(col(score)).as("sum_score"))
      .withColumn("pos_rate_ppm", expr("n_pos * 1000000 div n"))
      .orderBy(col("bin"))
}
