package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E38 — sparse-vector cosine similarity via an INVERTED-INDEX join:
  * the classic IR retrieval shape (document-at-a-time scoring over
  * posting lists), complementing the dense-embedding ANN family.
  * Vectors are bigram term-frequency maps; a pair's dot product is
  * accumulated by joining the two sides' posting rows on the gram key —
  * only grams the pair SHARES produce rows, so sparsity is the work
  * bound, never |V| and never all-pairs.
  *
  * Scale posture: everything shuffles on (doc, gram) or gram. The
  * document-frequency cap (`dfFrac`) is the classic posting-list
  * bound — a gram in more than dfFrac·N documents carries no
  * discrimination and would dominate the join (its posting list joins
  * quadratically), so it is dropped BEFORE the index join; pair work is
  * then Σ_g df_q(g)·df(g) over surviving grams. Norms use the same
  * kept-gram vectors on both engines, and the cosine is the engine's
  * standard exact-integer discipline (BIGINT dot and norms, two sqrts,
  * one divide).
  */
object SparseSim {

  def topK(docs: DataFrame, qMod: Long = 50, k: Int = 5,
           dfFrac: Double = 0.4): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val grams = docs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 1), i -> concat(ts[i-1], ' ', ts[i]))"))
        .as("gram"))
    val tf = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val keptGrams = tf.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs").cast("double") * dfFrac)
      .select(col("gram"))
    val kept = tf.join(keptGrams, Seq("gram"))
    val norms = kept.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("norm2"))

    val q = kept.filter(col("doc_id") % qMod === 0)
      .select(col("doc_id").as("q_id"), col("gram"), col("tf").as("tfq"))
    val dots = q.join(kept, Seq("gram"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("tfq") * col("tf")).as("dot"))
    val qNorms = norms.select(col("doc_id").as("q_id"), col("norm2").as("qn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("doc_id"))
    dots
      .join(broadcast(qNorms), Seq("q_id"))
      .join(norms, Seq("doc_id"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("qn2").cast("double")) * sqrt(col("norm2").cast("double"))))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
