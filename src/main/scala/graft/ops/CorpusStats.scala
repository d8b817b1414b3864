package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E56/E57 — whole-corpus statistical profiles: the Zipf rank-frequency
  * law and the Heaps vocabulary-growth law, the two diagnostics a
  * training-data curator reads before trusting a crawl (a corpus whose
  * frequency histogram is far off Zipf is boilerplate- or spam-heavy;
  * a vocabulary that stops growing is a dedup/coverage red flag —
  * Baeza-Yates & Navarro, "Block addressing indices…" JASIS 2000 treats
  * both laws together).
  *
  * Neither operator ranks anything globally: a literal Zipf rank plot
  * would need a corpus-wide total order over the vocabulary (a
  * single-reducer sort at 100 TB). Instead both laws are read through
  * DOUBLING BUCKETS — integer bit-lengths (`length(bin(x))` here,
  * `length(to_base(x,2))` in DuckDB, the E50 idiom), which contract
  * every frame to ≤64 rows before any window runs. All arithmetic is
  * integer, so the DuckDB twins hash exactly.
  */
object CorpusStats {

  private def bl(c: Column): Column = length(bin(c)).cast("long")

  /** E56 — Zipf profile as a frequency doubling-histogram: vocabulary
    * words bucketed by the BIT LENGTH of their corpus frequency; per
    * bucket the word count, occurrence mass, frequency range, the
    * cumulative share of the corpus carried by words at or above the
    * bucket (ppm), and `zipf_const_bits = bl(n_words) + freq_bits − 1`
    * — under an α=1 Zipf law the number of words in the doubling band
    * [2^(b−1), 2^b) is ≈ C/2^b, so this sum is ≈ bl(C), CONSTANT
    * across buckets; curvature (rising tail, sagging head) reads
    * directly as deviation from the law.
    *
    * Scale: one tokenize pass + one vocabulary-keyed aggregation (the
    * corpus's only shuffle), then contraction to ≤64 bucket rows —
    * the windows only ever see those. */
  def zipfProfile(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val buckets = vocab
      .groupBy(bl(col("f")).as("freq_bits"))
      .agg(count(lit(1)).as("n_words"), sum(col("f")).as("n_occ"),
        min(col("f")).as("min_f"), max(col("f")).as("max_f"))
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.orderBy(col("freq_bits").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    buckets
      .withColumn("tot_occ", sum(col("n_occ")).over(tot))
      .withColumn("cum_occ", sum(col("n_occ")).over(cum))
      .select(col("freq_bits"), col("n_words"), col("n_occ"),
        col("min_f"), col("max_f"),
        expr("1000000 * cum_occ div tot_occ").as("cum_share_ppm"),
        (bl(col("n_words")) + col("freq_bits") - 1L).as("zipf_const_bits"))
      .orderBy(col("freq_bits"))
  }

  /** E57 — Heaps vocabulary-growth curve at doubling corpus prefixes:
    * for each doc-id prefix {doc_id < 2^k} the cumulative doc count,
    * token count, distinct-word count, and the MARGINAL new-word rate
    * of the k-th slab (`new_rate_ppm = 10⁶·new_vocab div new_tokens`)
    * — under Heaps' law V = K·N^β the marginal rate decays as
    * N^(β−1); a rate that stops decaying means the crawl keeps finding
    * genuinely novel text (or junk), one that collapses to ~0 means
    * the corpus has saturated. Prefixes are doc-ID-ordered — the
    * ingest order, the one growth order that means something.
    *
    * A word's first prefix is `k_w = bl(min_doc)` (0 for doc 0): the
    * smallest k with min_doc < 2^k. Scale: one (word → min doc_id)
    * aggregation — vocabulary-sized, the only shuffle beyond the
    * per-doc token counts — then contraction to ≤64 prefix rows. */
  def heapsGrowth(docs: DataFrame): DataFrame = {
    val firstK = when(col("m") === 0L, 0L).otherwise(bl(col("m")))
    val vb = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(min(col("doc_id")).as("m"))
      .groupBy(firstK.as("k")).agg(count(lit(1)).as("new_vocab"))
    val tb = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("n_toks"))
      .groupBy(when(col("doc_id") === 0L, 0L).otherwise(bl(col("doc_id")))
        .as("k"))
      .agg(count(lit(1)).as("new_docs"), sum(col("n_toks")).as("new_tokens"))
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    // every word's first doc is a doc, so vb's k-set ⊆ tb's k-set
    tb.join(vb, Seq("k"), "left")
      .withColumn("new_vocab", coalesce(col("new_vocab"), lit(0L)))
      .withColumn("n_docs", sum(col("new_docs")).over(w))
      .withColumn("n_tokens", sum(col("new_tokens")).over(w))
      .withColumn("n_vocab", sum(col("new_vocab")).over(w))
      .select(col("k"), col("n_docs"), col("n_tokens"), col("n_vocab"),
        col("new_vocab"), col("new_tokens"),
        when(col("new_tokens") > 0,
          expr("1000000 * new_vocab div new_tokens")).otherwise(lit(0L))
          .as("new_rate_ppm"))
      .orderBy(col("k"))
  }

  /** E62 — pairwise total-variation distance between per-source unigram
    * distributions: the E36 mixture designer's distance matrix ("are
    * src3 and src7 the same crawl wearing two names? is src12 an
    * outlier worth upweighting?"), and the metric DSIR-style domain
    * weighting implicitly optimizes against. TV is the one f-divergence
    * computable EXACTLY in integers: by the Σmin identity,
    * TV(p,q) = 1 − Σ_w min(p_w, q_w), so with per-source counts f and
    * totals T, `tv_ppm = 10⁶·(T_a·T_b − Σ_w min(f_aw·T_b, f_bw·T_a))
    * div (T_a·T_b)` — no logs (KL/JS would put transcendentals in the
    * oracle path), no floored per-word shares (the cross-multiplied
    * form never divides until the final ppm). Words absent from one
    * side need no outer join: they contribute zero to Σmin by
    * construction — the identity absorbs the asymmetric mass.
    *
    * Scale: one tokenize pass contracts the corpus to (source, word)
    * counts — the only corpus-sized shuffle; the distance matrix is a
    * word-keyed self-join of that contraction (each word fans out to
    * ≤|sources|² pairs, |sources| is bounded — cap or bucket first if
    * it isn't) folding straight into |sources|²/2 rows. Products are
    * decimal(38,0) (HUGEINT twin): f·T overflows int64 once
    * token-count² > 9·10¹⁸ — i.e. at ~3·10⁹ tokens, real at scale. */
  def sourceTvMatrix(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("f"))
    val wt = Window.partitionBy(col("source"))
    val sided = counts.withColumn("t", sum(col("f")).over(wt))
    val a = sided.select(col("w"), col("source").as("source_a"),
      col("f").as("fa"), col("t").as("ta"))
    val b = sided.select(col("w"), col("source").as("source_b"),
      col("f").as("fb"), col("t").as("tb"))
    a.join(b, Seq("w"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(max(col("ta")).as("ta"), max(col("tb")).as("tb"),
        count(lit(1)).as("n_shared_words"),
        sum(least(col("fa").cast("decimal(38,0)") * col("tb"),
          col("fb").cast("decimal(38,0)") * col("ta"))).as("smin"))
      .select(col("source_a"), col("source_b"), col("n_shared_words"),
        expr("""1000000 * (cast(ta as decimal(38,0)) * tb - smin)
          div (cast(ta as decimal(38,0)) * tb)""").cast("long")
          .as("tv_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** E68 — tokenizer FERTILITY profile per (lang, source): characters
    * per whitespace token and estimated BPE pieces per token (E9's
    * exact definitions), in exact ppm — the tokenizer-budget mart a
    * training pipeline reads before mixing sources: fertility is why
    * "1B tokens" of two sources are different amounts of text, a
    * fertility OUTLIER within a language is encoding junk or
    * boilerplate markup wearing that language's label, and
    * cross-language fertility spread is the known tokenizer-equity
    * number (BPE pieces per word vary by script). Whitespace tokens
    * and the (len+3) div 4 BPE estimate are shared verbatim with E9
    * so corpus token budgets and this mart are one arithmetic.
    *
    * Scale: pure map-side derivation per doc (no tokenize explode —
    * token counts come off length arithmetic), one contraction to the
    * (lang, source) grid. */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        expr("""cast(size(filter(split(text, ' '), w -> length(w) > 0))
            as bigint)""").as("n_toks"),
        expr("cast((length(text) + 3) div 4 as bigint)").as("n_bpe"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_toks")).as("n_tokens"), sum(col("n_bpe")).as("n_bpe"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("n_bpe"),
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("CAST(1000000 * CAST(n_chars AS DECIMAL(38,0)) div n_tokens AS BIGINT)"))
          .as("chars_per_tok_ppm"),
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("1000000 * n_bpe div n_tokens"))
          .as("bpe_per_tok_ppm"))
      .orderBy(col("lang"), col("source"))

  /** E67 — per-source SNAPSHOT drift: total-variation distance between
    * the unigram distributions of a source's two interleaved doc-id
    * halves (`doc_id % 2` — the deterministic stand-in for "crawl A vs
    * crawl B"; any snapshot key column slots in). E62 compares sources
    * to EACH OTHER; this is the within-source stability check a
    * curator runs before trusting a source's profile at all — a
    * homogeneous source drifts near 0 between halves, while a high
    * tv_ppm says the source is really two populations wearing one
    * label (mixed crawls, a mid-corpus format change) and its E56/E66
    * profile is an average of incomparables. Same Σmin identity, same
    * integer exactness, NO self-join at all: both halves live on one
    * (source, word) row, so the matrix collapses to one pass. An
    * empty half pins tv_ppm = 10⁶ (maximal drift — the other half is
    * unmatched by definition), documented, never NULL.
    *
    * Scale: one tokenize shuffle to (source, word) with two
    * conditional sums; contraction to one row per source. Products
    * decimal(38,0) (HUGEINT twin), the E62 bound. */
  def snapshotTvDrift(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"), (col("doc_id") % 2).as("snap"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w"))
      .agg(sum(when(col("snap") === 0L, 1L).otherwise(0L)).as("f0"),
        sum(when(col("snap") === 1L, 1L).otherwise(0L)).as("f1"))
    val wt = Window.partitionBy(col("source"))
    counts
      .withColumn("t0", sum(col("f0")).over(wt))
      .withColumn("t1", sum(col("f1")).over(wt))
      .groupBy(col("source"))
      .agg(max(col("t0")).as("t0"), max(col("t1")).as("t1"),
        sum(least(col("f0").cast("decimal(38,0)") * col("t1"),
          col("f1").cast("decimal(38,0)") * col("t0"))).as("smin"))
      .select(col("source"), col("t0"), col("t1"),
        when(col("t0") === 0L || col("t1") === 0L, lit(1000000L))
          .otherwise(expr("""1000000 * (cast(t0 as decimal(38,0)) * t1
              - smin) div (cast(t0 as decimal(38,0)) * t1)""")
            .cast("long"))
          .as("tv_ppm"))
      .orderBy(col("source"))
  }

  /** E63 — cross-source CONTENT-leakage matrix: for each source pair
    * the shared distinct word-3-gram shingles and both directional
    * containments (`leak_a_ppm = 10⁶·|Sₐ∩S_b| div |Sₐ|`) — the E62
    * matrix's complement: TV says whether two sources SOUND alike
    * (unigram distributions), this says whether they literally CARRY
    * the same text (mirrors, syndication, one crawl re-labeled as
    * two) — directional, because a small source fully contained in a
    * big one is the "re-labeled subset" signature that symmetric
    * measures dilute (the E48 containment argument at source
    * granularity). Shingles are the dedup pipeline's exact
    * definition (E3's word 3-grams, I1's md5-prefix hash) so a pair
    * flagged here is made of the SAME units E2/E41 verify on.
    *
    * Scale: one shingle pass contracts the corpus to distinct
    * (source, shingle-hash) — corpus-sized work, the only big
    * shuffle; the matrix is a hash-keyed self-join fanning each
    * shingle to ≤|sources|² pairs (bounded source domain, the E62
    * contract) and folding straight to |sources|²/2 rows. */
  def sourceLeakageMatrix(docs: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.h32
    val perSrc = graft.ops.Dedup
      .withShingles(docs.select(col("source"), col("text")),
        distinct = false)
      .select(col("source"), explode(col("sh")).as("s"))
      .select(col("source"), h32(col("s")).as("x"))
      .distinct()
    val sizes = perSrc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_sh"))
    val a = perSrc.select(col("x"), col("source").as("source_a"))
    val b = perSrc.select(col("x"), col("source").as("source_b"))
    a.join(b, Seq("x"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("source").as("source_a"),
        col("n_sh").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"),
        col("n_sh").as("n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("1000000 * n_shared div n_a").as("leak_a_ppm"),
        expr("1000000 * n_shared div n_b").as("leak_b_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** E66 — per-source Gini–Simpson lexical diversity (Simpson, Nature
    * 1949): the probability two tokens drawn WITHOUT replacement are
    * the same word — `simpson_ppm = 10⁶·Σf(f−1) div (T(T−1))` — and
    * its complement `diversity_ppm`. This is the one classical
    * diversity index with NO logarithm (Shannon entropy would put
    * transcendentals in the oracle path — the E62 argument), and the
    * without-replacement form is the unbiased estimator, exact in
    * integers. Reads: template/boilerplate-dominated sources score
    * concentrated (high simpson) even when their raw vocabulary E57
    * counts look healthy; a diversity CLIFF between two sources E62
    * calls near-identical is a repetition artifact, not content.
    * Degenerate sources (≤1 token) pin to 0, documented.
    *
    * Scale: one tokenize pass to (source, word) counts — the corpus's
    * only shuffle — then contraction to one row per source; Σf(f−1)
    * in decimal(38,0)/HUGEINT (f² passes int64 at ~3·10⁹ occurrences
    * of one word — real for stop words at 100 TB). */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("f"))
    counts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_vocab"), sum(col("f")).as("n_tokens"),
        sum((col("f").cast("decimal(38,0)") * (col("f") - 1L)))
          .as("coll"))
      .select(col("source"), col("n_vocab"), col("n_tokens"),
        when(col("n_tokens") <= 1L, lit(0L))
          .otherwise(expr(
            """1000000 * coll div
               (cast(n_tokens as decimal(38,0)) * (n_tokens - 1))""")
            .cast("long")).as("simpson_ppm"))
      .withColumn("diversity_ppm",
        when(col("n_tokens") <= 1L, lit(0L))
          .otherwise(lit(1000000L) - col("simpson_ppm")))
      .orderBy(col("source"))
  }

  /** E72 — per-source OUT-OF-VOCABULARY rate against the corpus's own
    * top-V vocabulary: the tokenizer-coverage read E68's fertility
    * can't give — fertility says how many pieces a word shatters
    * into; OOV rate says how much of a source's token MASS falls
    * outside the head vocabulary at all (transliterations, code,
    * mojibake, boilerplate IDs — exactly the sources that later blow
    * up a fixed-vocab tokenizer). Vocabulary = top `vocabSize` tokens
    * by corpus occurrence count, ties broken by token ascending (a
    * TOTAL order, so the cut line is deterministic cross-engine); per
    * source: occurrence-mass OOV share in ppm plus the distinct OOV
    * type count (mass says "how much", types say "how varied").
    *
    * Scale: one token pass to (source, w) counts — the corpus-sized
    * shuffle; the global vocab is a word-domain aggregate of that
    * same frame (no second corpus scan) whose top-V cut is one
    * word-domain sort; membership rides a broadcast semi-join. */
  def oovRate(docs: DataFrame, vocabSize: Int = 2000): DataFrame = {
    val perSource = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("f"))
    val vocab = perSource.groupBy(col("w"))
      .agg(sum(col("f")).as("cf"))
      .orderBy(col("cf").desc, col("w"))
      .limit(vocabSize)
      .select(col("w"))
    finishOovMass(perSource
      .join(broadcast(vocab.withColumn("in_vocab", lit(1L))),
        Seq("w"), "left")
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("f")).otherwise(0L))
          .as("oov_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("oov_types")))
      .orderBy(col("source"))
  }

  /** E72's deploy-time vocabulary off a STATIC reference corpus — the
    * table the F37 streaming monitor broadcasts (a live monitor pins
    * its vocabulary at deploy time; recomputing it per batch would
    * make OOV rates non-comparable across batches, the F17 rule). */
  def topVocab(docs: DataFrame, vocabSize: Int = 2000): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("w"))
      .limit(vocabSize)
      .select(col("w"))

  /** The ppm back half over per-source (n_tokens, oov_tokens[, …])
    * counters — shared verbatim with the F37 streaming monitor so
    * live and batch OOV mass are the same arithmetic. */
  def finishOovMass(counts: DataFrame): DataFrame =
    counts.withColumn("oov_ppm",
      when(col("n_tokens") === 0L, lit(0L))
        // ×10⁶ widened through DECIMAL(38): a raw long multiply wraps
        // past ~9.2e12 OOV tokens per source while the DuckDB twin's
        // SUM auto-promotes to HUGEINT — the chars_per_tok_ppm /
        // mean_df_bits_e6 / Gini-share wrap class
        .otherwise(expr(
          "CAST(1000000 * CAST(oov_tokens AS DECIMAL(38,0)) div n_tokens AS BIGINT)")))

  /** E64 — per-document NOVELTY profile against the whole corpus: how
    * much of each document's shingle set exists nowhere else
    * (`unique_ppm`), how common its most-common shingle is (`max_df`),
    * and the mean document-frequency DOUBLING BUCKET of its shingles
    * (`mean_df_bits_e6` — the E56 bit-length idiom: an integer-exact
    * stand-in for mean log₂ df, i.e. for the self-information a
    * KenLM-style filter would estimate). The three numbers separate
    * the corpus a curator wants (high unique share, low df mass —
    * genuinely novel text) from boilerplate carriers (low unique
    * share, high-df shingles — template text E59 then localizes) —
    * per DOCUMENT, where E56/E59 profile the corpus and source.
    *
    * Scale: one shingle pass to distinct (doc, hash) — the corpus-
    * sized shuffle; one hash-keyed df aggregation; one join back.
    * The same units as E3/E63 (word 3-grams, I1 md5-prefix hash). */
  def docNovelty(docs: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.h32
    val sh = graft.ops.Dedup
      .withShingles(docs.select(col("doc_id"), col("text")),
        distinct = false)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), h32(col("s")).as("x"))
      .distinct()
    val df = sh.groupBy(col("x")).agg(count(lit(1)).as("df"))
    sh.join(df, Seq("x"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"),
        max(col("df")).as("max_df"),
        sum(bl(col("df"))).as("sum_df_bits"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("1000000 * n_unique div n_shingles").as("unique_ppm"),
        col("max_df"),
        expr("CAST(1000000 * CAST(sum_df_bits AS DECIMAL(38,0)) div n_shingles AS BIGINT)")
          .as("mean_df_bits_e6"))
      .orderBy(col("doc_id"))
  }
}
