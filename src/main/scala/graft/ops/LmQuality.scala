package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E50 — n-gram language-model quality scoring (the CCNet/KenLM
  * pipeline stage: score every document by its cross-entropy under a
  * reference LM, bucket or filter on the result). The model is a
  * bigram stupid-backoff LM (Brants et al., EMNLP 2007) trained on the
  * corpus' own held-in slice (`doc_id % trainMod != 0`), and the score
  * is the per-bigram average code length in BIT units:
  *
  *   seen bigram      bits = bl(c1(w1)) − bl(c2(w1,w2))   (≈ −log₂ c2/c1)
  *   backoff unigram  bits = bl(T) − bl(c1(w2)) + backoffBits
  *   OOV              bits = bl(T) + oovBits
  *
  * where bl(x) = ⌊log₂ x⌋+1 is the INTEGER bit length (`length(bin(x))`
  * here, `length(to_base(x,2))` in DuckDB) and T the total train token
  * mass. Replacing ln with bit length keeps every statistic an exact
  * integer — the transcendental-free discipline of E39's BM25 — at the
  * cost of quantizing each log to whole bits; ranking quality-filter
  * behavior (CCNet buckets docs into head/middle/tail by perplexity
  * terciles) is insensitive to sub-bit precision. Both bit counts are
  * non-negative by construction (c2 ≤ c1(w1) term-by-term, c1 ≤ T).
  *
  * Contraction (I14): identical texts have identical scores, so
  * tokenize/score once per distinct CONTENT and expand through the
  * membership frame; model counts stay DOC-weighted (a corpus
  * statement, like BM25's df) by weighting each content's occurrences
  * with its number of TRAIN member docs.
  *
  * Scale: two vocabulary-shuffles build the model (unigram + bigram
  * count frames — shuffle-joined to the pair stream, never broadcast:
  * a 100 TB corpus' bigram vocabulary is itself large); one
  * content-keyed pair shuffle scores the corpus. The scoring joins are
  * all on the pair/token key, so AQE sizes them; no per-doc state
  * beyond the token array inside one codegen pass. */
object LmQuality {

  /** Output: (doc_id, n_pairs, bits_sum, mbits_per_pair) — milli-bits
    * of model surprise per bigram (−1 for docs with < 2 tokens). */
  def score(docs: DataFrame, trainMod: Long = 5,
            backoffBits: Int = 4, oovBits: Int = 8): DataFrame = {
    val withCh = docs.select(col("doc_id"), col("text"),
      md5(col("text")).as("ch"))
    // content-count-sized; tcnt = train member docs carrying this text
    val reps = withCh.groupBy(col("ch"))
      .agg(min(col("doc_id")).as("rep"),
        sum(when(col("doc_id") % trainMod =!= 0, 1L).otherwise(0L))
          .as("tcnt"))
      .localCheckpoint(true)
    val members = withCh.join(reps.select(col("ch"), col("rep")), Seq("ch"))
      .select(col("rep"), col("doc_id"))
    val repDocs = withCh
      .join(reps.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val toks = repDocs.select(col("doc_id"), explode(col("t")).as("w"))
    val pairs = repDocs
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t)-1), " +
          "i -> struct(element_at(t, i) AS w1, element_at(t, i+1) AS w2)) " +
          "ELSE array() END")).as("pr"))
      .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val tcnts = reps.select(col("rep").as("doc_id"), col("tcnt"))
    val uni = toks.join(tcnts, Seq("doc_id"))
      .filter(col("tcnt") > 0)
      .groupBy(col("w")).agg(sum(col("tcnt")).as("c1"))
      // the unigram model feeds three consumers (both scoring joins +
      // tot) — un-cut, each re-ran the token explode + count. Vocab-
      // sized at any corpus scale.
      .localCheckpoint(true)
    val big = pairs.join(tcnts, Seq("doc_id"))
      .filter(col("tcnt") > 0)
      .groupBy(col("w1"), col("w2")).agg(sum(col("tcnt")).as("c2"))
    val tot = uni.agg(sum(col("c1")).as("tot"))
    def bl(c: org.apache.spark.sql.Column) = length(bin(c)).cast("long")
    val scored = pairs
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("c1w1")),
        Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        when(col("c2").isNotNull, bl(col("c1w1")) - bl(col("c2")))
          .when(col("c1w2").isNotNull,
            bl(col("tot")) - bl(col("c1w2")) + lit(backoffBits.toLong))
          .otherwise(bl(col("tot")) + lit(oovBits.toLong)).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("bits")).as("bits_sum"))
    reps.select(col("rep"))
      .join(scored.withColumnRenamed("doc_id", "rep"), Seq("rep"), "left")
      .select(col("rep"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("bits_sum"), lit(0L)).as("bits_sum"))
      .join(members, Seq("rep"))
      .select(col("doc_id"), col("n_pairs"), col("bits_sum"),
        when(col("n_pairs") > 0,
          expr("(1000 * bits_sum) div n_pairs")).otherwise(-1L)
          .as("mbits_per_pair"))
      .orderBy(col("doc_id"))
  }

  /** E52 — CCNet's head/middle/tail perplexity gate: per-language
    * tercile buckets over the E50 score (Wenzek et al., LREC 2020 —
    * CCNet keeps "head" and often "middle", drops "tail").
    *
    * The cutoffs come from a DISTINCT-VALUE contraction, not a
    * per-language rank: score values are bucketed (lang, mbits) with
    * counts, the cumulative window runs over that domain-sized frame,
    * and t_k = min score whose cumulative mass covers k/3 of the
    * language (3·cum ≥ k·n — exact integer form of cum ≥ ⌈k·n/3⌉).
    * A per-language `ntile` would sort the whole corpus in one reducer
    * per language (languages are few — the worst window skew); the
    * contraction's window input is the score DOMAIN, thousands of rows
    * at any corpus size, and bucket assignment is a broadcast-join
    * comparison. Ties share a value and land in one bucket — the
    * value-based semantics both engines replay exactly (the H4/H8
    * distinct-score discipline). Unscoreable docs (< 2 tokens) are
    * excluded, as in CCNet. */
  def perplexityBuckets(docs: DataFrame, trainMod: Long = 5): DataFrame = {
    val scored = score(docs, trainMod).filter(col("n_pairs") > 0)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      // feeds the cutoff histogram AND the final bucket join — un-cut,
      // the whole E50 scoring pipeline ran twice. Doc-count-sized,
      // five narrow columns.
      .localCheckpoint(true)
    val hist = scored.groupBy(col("lang"), col("mbits_per_pair"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("lang")).orderBy(col("mbits_per_pair"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wc))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val cuts = cum.groupBy(col("lang")).agg(
      min(when(col("cum") * 3 >= col("n"), col("mbits_per_pair"))).as("t1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("mbits_per_pair"))).as("t2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("mbits_per_pair"),
        when(col("mbits_per_pair") <= col("t1"), "head")
          .when(col("mbits_per_pair") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }
}
