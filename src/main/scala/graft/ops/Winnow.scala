package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E55 — winnowing fingerprint selection (Schleimer, Wilkerson &
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 — the MOSS algorithm): from every window of `w`
  * consecutive k-gram hashes, keep the RIGHTMOST MINIMAL hash. The
  * guarantee: any shared substring of ≥ w+k−1 tokens between two
  * documents is caught by at least one shared fingerprint, while
  * expected density drops to 2/(w+1) of the full n-gram set — the
  * standard way to cut a substring-matching index to a fraction of
  * E29's every-gram postings without losing long matches.
  *
  * Cross-engine determinism: selection runs on a single packed BIGINT
  * key `g·2^28 + (2^28−1−pos)` — one plain MIN window over it picks
  * the smallest hash and, on ties, the largest position (exactly
  * rightmost-min), so both engines replay selection with one window
  * function and no argmin plumbing. Positions must fit 2^28
  * (268M-token documents — far past any real document).
  *
  * Scale shape: fingerprinting is a per-document map + one
  * doc-partitioned window — embarrassingly parallel, no corpus-sized
  * shuffle. The pair stage runs on the I14 content contraction
  * (identical texts fingerprint identically) and joins df-capped
  * fingerprint postings — index-sized work, never all-pairs.
  */
object Winnow {

  private val PosB = 1L << 28

  /** Distinct selected fingerprints (doc, sel_pos, g) per document. */
  private[graft] def fingerprints(docs: DataFrame, gram: Int, w: Int): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val grams = docs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextNative.ngramHashesL(col("text"), gram))
          .as(Seq("pos0", "g")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos0"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("wmin",
        min(col("g") * PosB + (lit(PosB - 1) - col("pos0"))).over(win))
      // only full windows select (count == w); trailing partial windows
      // are not windows of the algorithm
      .withColumn("wn", count(lit(1)).over(win))
      .filter(col("wn") === w)
      .select(col("doc_id"), col("wmin")).distinct()
      .select(col("doc_id"),
        (lit(PosB - 1) - col("wmin") % PosB).as("sel_pos"),
        // integer div: `/` on BIGINT is a double in Spark but not DuckDB
        expr(s"wmin div ${PosB}L").as("g"))
  }

  /** Per-document fingerprint profile: window count, selected count,
    * selection density in ppm (expected ≈ 2/(w+1)·10^6), and the
    * fingerprint value range. Documents with fewer than w k-gram
    * windows have no full window and are absent — same contract as the
    * short-doc edge of the n-gram family. */
  def profile(docs: DataFrame, gram: Int = 3, w: Int = 4): DataFrame = {
    val fp = fingerprints(docs, gram, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        min(col("g")).as("min_g"), max(col("g")).as("max_g"))
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val nw = docs
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        (size(graft.functions.TextNative.ngramHashesL(col("text"), gram))
          .cast(LongType) - lit(w - 1)).as("n_windows"))
      .filter(col("n_windows") >= 1)
    nw.join(fp, Seq("doc_id"))
      .select(col("doc_id"), col("n_windows"), col("n_fps"),
        expr("n_fps * 1000000 div n_windows").as("density_ppm"),
        col("min_g"), col("max_g"))
      .orderBy(col("doc_id"))
  }

  /** Content pairs sharing ≥ `minShared` distinct selected fingerprint
    * hashes — the detection join the fingerprint index exists for,
    * at 2/(w+1) of the full-gram posting volume. Pairs are emitted at
    * the I14 content granularity (canonical rep = min doc_id per md5;
    * identical texts fingerprint identically, so replicas ride their
    * rep); doc-level expansion is the same membership join the LSH
    * family uses (E16). Fingerprints present in more than `dfCap`
    * contents are dropped from the pair join (boilerplate — the E38
    * posting-cap discipline), so per-fingerprint fan-out is bounded
    * and the join never degenerates toward all-pairs. */
  def sharedPairs(docs: DataFrame, gram: Int = 3, w: Int = 4,
                  dfCap: Int = 24, minShared: Long = 2): DataFrame = {
    val withCh = docs.select(col("doc_id"), col("text"), md5(col("text")).as("ch"))
    val reps = withCh.groupBy(col("ch")).agg(min(col("doc_id")).as("doc_id"))
    val repDocs = withCh
      .join(reps.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val fp = fingerprints(repDocs, gram, w)
      .select(col("doc_id"), col("g")).distinct()
    val rare = fp.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("g"))
    val posts = fp.join(rare, Seq("g"))
    posts.select(col("g"), col("doc_id").as("id1"))
      .join(posts.select(col("g"), col("doc_id").as("id2")), Seq("g"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("id1"), col("id2"))
  }
}
