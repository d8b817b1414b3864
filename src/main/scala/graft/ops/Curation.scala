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
             minDistinctRatio: Double = 0.05): DataFrame =
    curateKeepers(docs, langs, minTokens, maxTokens, minDistinctRatio)
      .orderBy(col("doc_id"))

  /** [[curate]] without the presentation sort — the composable form
    * ([[curateFull]] joins it; a mid-plan range exchange would be
    * waste). */
  private def curateKeepers(docs: DataFrame, langs: Seq[String],
                            minTokens: Long, maxTokens: Long,
                            minDistinctRatio: Double): DataFrame = {
    val gated = docs
      // native single-pass token stats (codegen'd; the composed
      // split→sort→aggregate form runs interpreted per row)
      .withColumn("ts", graft.functions.TextNative.tokenStatsL(col("text")))
      .withColumn("n_tokens", col("ts.n"))
      .withColumn("n_distinct", col("ts.d"))
      .drop("ts")
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
  }

  /** The COMPLETE curation pipeline (E12 + near-dup clustering): the
    * quality/language/exact-dedup gate of [[curate]], then drop every
    * doc that sits in a near-dup cluster without being its canonical
    * keeper ([[graft.ops.Dedup.lshClusters]] min-id). This is the
    * end-to-end "raw corpus → training set" operator: at 100 TB both
    * inputs are id-keyed frames and the final join is a hash join on
    * doc_id — no new shuffle shapes beyond the parts. */
  def curateFull(docs: DataFrame,
                 langs: Seq[String] = Seq("en", "de", "fr"),
                 minTokens: Long = 20, maxTokens: Long = 1000,
                 minDistinctRatio: Double = 0.05): DataFrame = {
    val gated = curateKeepers(docs, langs, minTokens, maxTokens, minDistinctRatio)
    val clusters = Dedup.lshClusters(docs)
      .select(col("doc_id"), col("cluster_id"))
    gated
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("content_hash"))
      .orderBy(col("doc_id"))
  }

  /** E70 — curation FUNNEL attribution: per (source, reason) the doc
    * count and token mass lost at each gate of the E19 pipeline, with
    * reason = the FIRST failing gate in the pinned order lang →
    * too-short → too-long → low-diversity → exact-dup → near-dup →
    * kept. [[curateFull]] returns the survivors; this is the report on
    * everyone else — the "where did my corpus go" table a curator
    * reads before touching a threshold (a source losing half its mass
    * to `too_short` is a chunking bug; to `near_dup` a crawler loop —
    * same loss, opposite fixes). Gate predicates and keeper election
    * are shared semantics with curate/curateFull verbatim (exact-dup
    * keeper = min doc_id among GATE-PASSING copies; near-dup canonical
    * = cluster min id from the same full-corpus clustering), so
    * funnel['kept'] reconciles exactly with curateFull's output —
    * spec-pinned.
    *
    * Scale: curateFull's own shapes (one hash shuffle, the E16
    * cluster mapping, one id-keyed join) plus a contraction to the
    * (source, reason) grid — nothing new shuffles. */
  def curationFunnel(docs: DataFrame,
                     langs: Seq[String] = Seq("en", "de", "fr"),
                     minTokens: Long = 20, maxTokens: Long = 1000,
                     minDistinctRatio: Double = 0.05): DataFrame = {
    val base = docs
      .withColumn("ts", graft.functions.TextNative.tokenStatsL(col("text")))
      .withColumn("n_tokens", col("ts.n"))
      .withColumn("n_distinct", col("ts.d"))
      .drop("ts")
      .withColumn("content_hash", md5(col("text")))
      .withColumn("lang_ok", col("lang").isin(langs: _*))
      .withColumn("short_bad", col("n_tokens") < minTokens)
      .withColumn("long_bad", col("n_tokens") > maxTokens)
      .withColumn("div_bad",
        col("n_distinct") / col("n_tokens") < minDistinctRatio)
      .withColumn("passed", col("lang_ok") && !col("short_bad")
        && !col("long_bad") && !col("div_bad"))
    val wKeep = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    val clusters = Dedup.lshClusters(docs)
      .select(col("doc_id"), col("cluster_id"))
    base
      .withColumn("keep_id",
        min(when(col("passed"), col("doc_id"))).over(wKeep))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("reason",
        when(!col("lang_ok"), "1_lang")
          .when(col("short_bad"), "2_too_short")
          .when(col("long_bad"), "3_too_long")
          .when(col("div_bad"), "4_low_diversity")
          .when(col("doc_id") =!= col("keep_id"), "5_exact_dup")
          .when(col("cluster_id").isNotNull
            && col("cluster_id") =!= col("doc_id"), "6_near_dup")
          .otherwise("7_kept"))
      .groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("reason"))
  }

  /** E43 — per-source (domain) document cap: keep the k longest docs
    * per source, ties broken by smallest doc_id. The web-corpus
    * "cap documents per domain" curation step (a handful of giant
    * domains otherwise dominate the training mixture).
    *
    * Scale posture (the D46 count-of-counts discipline): NO
    * row_number over whole sources — a per-domain window sorts every
    * row of the biggest domain through one reducer, exactly the skew
    * hotspot domain capping exists to fight. Instead: (1) contract to
    * per-(source, n_chars) counts, (2) a window over DISTINCT lengths
    * only finds each source's boundary length + how many boundary
    * docs to take, (3) broadcast that domain-count-sized threshold
    * table and keep strictly-longer docs map-side, (4) row_number
    * only over the boundary slice (rows tied at exactly the threshold
    * length — tie-width-sized, not domain-sized). */
  def sourceCap(docs: DataFrame, k: Long = 10L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val cc = base.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("nv"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("n_chars").desc)
    val thr = cc
      .withColumn("cum", sum(col("nv")).over(wCum))
      .withColumn("above", col("cum") - col("nv"))
      .filter(col("cum") >= k && col("above") < k)
      .select(col("source"), col("n_chars").as("thr_chars"),
        (lit(k) - col("above")).as("boundary_take"))
    val joined = base.join(broadcast(thr), Seq("source"), "left")
    // Sources with < k docs have no threshold row: keep everything.
    val keepLong = joined
      .filter(col("thr_chars").isNull || col("n_chars") > col("thr_chars"))
      .select(col("source"), col("doc_id"), col("n_chars"))
    val wBoundary = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val keepBoundary = joined
      .filter(col("n_chars") === col("thr_chars"))
      .withColumn("rn", row_number().over(wBoundary))
      .filter(col("rn") <= col("boundary_take"))
      .select(col("source"), col("doc_id"), col("n_chars"))
    keepLong.unionByName(keepBoundary)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Int8-style embedding quantization summary: per-vector symmetric
    * scale 127/max|x|, quantized values summarized as exact ints
    * (deterministic: float→double promotion, two IEEE ops, round).
    *
    * ONE codegen'd pass ([[graft.functions.QuantStatsL]]) per vector —
    * the earlier functions-only fold was correct but ran on the
    * interpreted higher-order-function path; the native expression does
    * max|x| and the quantized sum/min/max in a single primitive loop
    * with no intermediate array. Same rounding, same hashes. */
  def quantizeStats(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"),
        graft.functions.FloatVecStats.quantStatsL(col("embedding")).as("qs"))
      .select(col("vec_id"),
        col("qs.s").as("q_sum"), col("qs.mn").as("q_min"),
        col("qs.mx").as("q_max"))
      .orderBy(col("vec_id"))
}
