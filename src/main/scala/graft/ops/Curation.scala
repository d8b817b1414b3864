package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.GraftFunctions._

/** Composite training-set curation (the end-to-end use case the
  * E-section operators exist for): quality-gate → language filter →
  * exact-dedup keeper selection, in one declarative plan. Keeper
  * selection is a min-over-window on content_hash — ONE hash shuffle
  * and a single pass over the gated rows (no second scan for a
  * semi-join build side); everything before it is map-side.
  */
object Curation {

  /** Docs that survive: token-count window, distinct-token ratio,
    * allowed language, and are the canonical (min doc_id) copy of their
    * content hash. */
  def curate(docs: DataFrame,
             langs: Seq[String] = Seq("en", "de", "fr"),
             minTokens: Long = 20, maxTokens: Long = 1000,
             minDistinctRatio: Double = 0.05): DataFrame = {
    val toks = split(col("text"), " ")
    val gated = docs
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("n_distinct", size(array_distinct(toks)).cast(LongType))
      .filter(col("lang").isin(langs: _*))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .filter(col("n_distinct") / col("n_tokens") >= minDistinctRatio)
      .withColumn("content_hash", md5(col("text")))
    val wKeep = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    gated
      .withColumn("keep_id", min(col("doc_id")).over(wKeep))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("content_hash"))
      .orderBy(col("doc_id"))
  }

  /** Int8-style embedding quantization summary: per-vector symmetric
    * scale 127/max|x|, quantized values summarized as exact ints
    * (deterministic: float→double promotion, two IEEE ops, round). */
  def quantizeStats(emb: DataFrame): DataFrame =
    emb
      .withColumn("dvec", transform(col("embedding"), x => x.cast("double")))
      .withColumn("max_abs",
        array_max(transform(col("dvec"), x => abs(x))))
      .withColumn("qvec",
        transform(col("dvec"), x => round(x * 127d / col("max_abs")).cast(LongType)))
      .select(
        col("vec_id"),
        aggregate(col("qvec"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("qvec")).as("q_min"),
        array_max(col("qvec")).as("q_max"))
      .orderBy(col("vec_id"))
}
