package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E39 — BM25 top-k retrieval over an inverted bigram index: the
  * standard lexical ranking function (Robertson et al.), scored
  * document-at-a-time through a posting-list join — the retrieval twin
  * of [[SparseSim]]'s cosine shape.
  *
  * Cross-engine determinism (SURVEY.md §5): BM25's usual
  * `ln((N-df+0.5)/(df+0.5))` idf is a transcendental whose last ulp is
  * library-dependent, so — like E28/E31 before it — the score stays in
  * rational space. With k1 = 6/5 and b = 3/4, a term's contribution
  *   idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * multiplied through by 10·S (S = Σ dl, avgdl = S/N) becomes a ratio
  * of EXACT integers,
  *   (2N−2df+1)/(2df+1) · 22·S·tf / (10·S·tf + 3·S + 9·dl·N),
  * (the idf is the Robertson ratio without the log — monotone in it, so
  * ranking-equivalent at equal tf geometry). Each side evaluates that
  * ratio with the SAME literal formula text (identical parse tree →
  * identical IEEE op sequence), rounds once to integer micro-units, and
  * sums BIGINTs — order-insensitive, hash-exact.
  *
  * Terms are adjacent-token BIGRAMS (via the native I17 expression):
  * on this shared-vocabulary synthetic corpus every unigram exceeds any
  * sane df cap, and bigrams are also what E38 indexes — one engine, one
  * term space. `dl` is the bigram count (n_tokens − 1), the document
  * length in term units.
  *
  * Scale posture: one (doc,tok) shuffle for tf, one tok shuffle for df;
  * the posting join is bounded exactly like E38 — a relative-df cap
  * drops non-discriminating terms (their idf is near the floor anyway)
  * and impact-ordered truncation (`postMax`, Anh & Moffat) caps
  * per-term fan-out absolutely, so a query batch costs
  * Σ_t min(df(t), postMax) regardless of corpus size. The query side is
  * a workload window, never the corpus.
  */
object Bm25 {

  private val TermMicros =
    "CAST(ROUND((22.0 * sd * tfd * (2.0*nd - 2.0*dfd + 1.0) * 1000000.0) / " +
      "((10.0*sd*tfd + 3.0*sd + 9.0*dld*nd) * (2.0*dfd + 1.0))) AS BIGINT)"

  def topK(docs: DataFrame, qMod: Long = 50, k: Int = 5,
           dfFrac: Double = 0.4, postMax: Int = 1000): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.TextNative.bigramsL(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"),
      size(graft.functions.TextNative.bigramsL(col("text")))
        .cast(LongType).as("dl"))
    val consts = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val kept0 = tf.join(df, Seq("tok"))
      .crossJoin(broadcast(consts))
      .filter(col("df") <= col("n").cast("double") * dfFrac)
    val wPost = Window.partitionBy(col("tok"))
      .orderBy(col("tf").desc, col("doc_id"))
    val kept = kept0.withColumn("pr", row_number().over(wPost))
      .filter(col("pr") <= postMax)
      .drop("pr")
    val q = kept.filter(col("doc_id") % qMod === 0)
      .select(col("doc_id").as("q_id"), col("tok"))
    val scored = q.join(kept, Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(dl, Seq("doc_id"))
      .select(col("q_id"), col("doc_id"),
        col("s").cast("double").as("sd"), col("tf").cast("double").as("tfd"),
        col("n").cast("double").as("nd"), col("df").cast("double").as("dfd"),
        col("dl").cast("double").as("dld"))
      .withColumn("u", expr(TermMicros))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("u")).as("score_u"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("score_u").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("score_u"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
