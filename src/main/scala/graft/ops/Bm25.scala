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
           dfFrac: Double = 0.4, postMax: Int = 1000,
           qMax: Long = 20000000L): DataFrame = {
    val spark = docs.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // Everything up to the content-level scored pairs is independent of
    // k — shared across every consumer in the session (I25): the
    // standalone ranking and the fusion feeder differ only in their
    // final cut, so the index build + posting-join scoring is paid once.
    val fragTag = s"bm25:qMod=$qMod:dfFrac=$dfFrac:postMax=$postMax:qMax=$qMax"
    // I14 contraction: the index holds one posting per distinct
    // CONTENT (identical texts have identical term vectors), while the
    // BM25 corpus statistics stay DOC-level — df, N, and S are summed
    // through group sizes, because document frequency and average
    // length are statements about the corpus, not the index. Scoring
    // then runs once per (query-content, candidate-content) pair and
    // doc pairs expand through membership joins. Impact truncation is
    // content-level (the correct unit: duplicate postings carry no
    // information and would otherwise crowd the impact window).
    val withCh = docs
      .select(col("doc_id"), col("text"), md5(col("text")).as("ch"))
    // content-count-sized (hash, id, count) frame, reused 4× and across
    // queries — materialized once per session; the text-bearing scan
    // stays lazy
    val reps = FragmentCache.materialize(spark, docs, s"$fragTag:reps") {
      withCh.groupBy(col("ch"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("gsz"))
    }
    val members = withCh.join(reps.select(col("ch"), col("rep")), Seq("ch"))
      .select(col("rep"), col("doc_id"))
    val repDocs = withCh
      .join(reps.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val grpSz = reps.select(col("rep").as("doc_id"), col("gsz"))
    val toks = repDocs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.TextNative.bigramsL(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // dl = Σ tf — a contracted-frame aggregation instead of a SECOND
    // corpus text scan + bigram pass. Contents with zero bigrams drop
    // out of `dl`, which is exact: they have no postings (never
    // scored) and contribute 0 to S; their group mass still reaches N
    // because n is summed from `reps`, not from dl rows.
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val consts = broadcast(reps.agg(sum(col("gsz")).as("n")))
      .crossJoin(dl.join(grpSz, Seq("doc_id"))
        .agg(sum(col("gsz") * col("dl")).as("s")))
    val df = tf.join(grpSz, Seq("doc_id"))
      .groupBy(col("tok")).agg(sum(col("gsz")).as("df"))
    val kept0 = tf.join(df, Seq("tok"))
      .crossJoin(broadcast(consts))
      .filter(col("df") <= col("n").cast("double") * dfFrac)
    val wPost = Window.partitionBy(col("tok"))
      .orderBy(col("tf").desc, col("doc_id"))
    val kept = kept0.withColumn("pr", row_number().over(wPost))
      .filter(col("pr") <= postMax)
      .drop("pr")
    // `qMax` makes the query side an ABSOLUTE workload window (the same
    // bound SparseSim carries): queries are a batch a user submits, not
    // a corpus fraction — without it the benchmark query set grows with
    // the corpus and the scoring join turns quadratic (measured 70 s at
    // the 30× unique corpus, r5). 20M keeps every sf0.01/sf0.1 id (incl.
    // the +10M synthetic dups) so small-scale hashes are unchanged.
    val qDocs = members
      .filter(col("doc_id") % qMod === 0 && col("doc_id") < qMax)
      .select(col("doc_id").as("q_id"), col("rep").as("qrep"))
    // workload × candidates-sized (bounded by the df cap + impact
    // truncation) — the expensive fragment, shared session-wide
    val scoredC = FragmentCache.materialize(spark, docs, s"$fragTag:scoredC") {
      val qPost = qDocs.select(col("qrep")).distinct()
        .join(kept.select(col("doc_id").as("qrep"), col("tok")), Seq("qrep"))
      qPost.join(kept, Seq("tok"))
        // dl is content-count-sized: no forced broadcast hint (AQE
        // broadcasts while small; must be free to shuffle at web scale)
        .join(dl, Seq("doc_id"))
        .select(col("qrep"), col("doc_id").as("crep"),
          col("s").cast("double").as("sd"), col("tf").cast("double").as("tfd"),
          col("n").cast("double").as("nd"), col("df").cast("double").as("dfd"),
          col("dl").cast("double").as("dld"))
        .withColumn("u", expr(TermMicros))
        .groupBy(col("qrep"), col("crep"))
        .agg(sum(col("u")).as("score_u"))
    }
    // Content-level top cut BEFORE expansion (exact): a doc whose
    // content has ≥ k+1 member-docs at STRICTLY higher scores can never
    // reach the top k — even if the excluded self doc is one of them.
    // Group content scores per (query, score), running-sum the member
    // mass over strictly higher scores, and keep only contents with
    // higher-mass ≤ k. Ties at the boundary all survive and the final
    // doc-level (score, doc_id) window settles them — so the expansion
    // is O(k + tie mass) rows per query instead of every candidate.
    val grpScore = scoredC
      .join(grpSz.select(col("doc_id").as("crep"), col("gsz")), Seq("crep"))
    val byScore = grpScore.groupBy(col("qrep"), col("score_u"))
      .agg(sum(col("gsz")).as("msz"))
    val wScore = Window.partitionBy(col("qrep")).orderBy(col("score_u").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = byScore
      .withColumn("higher", coalesce(sum(col("msz")).over(wScore), lit(0L)))
      .filter(col("higher") < k + 1)
      .select(col("qrep"), col("score_u"))
    val expanded = qDocs
      .join(scoredC.join(cut, Seq("qrep", "score_u")), Seq("qrep"))
      .join(members.select(col("rep").as("crep"), col("doc_id")), Seq("crep"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"), col("score_u"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("score_u").desc, col("doc_id"))
    expanded
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("score_u"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
