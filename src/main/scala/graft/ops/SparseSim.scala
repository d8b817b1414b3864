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
  * Scale posture: everything shuffles on (doc, gram) or gram, and THREE
  * bounds keep the index join from growing with the corpus:
  * (1) the relative document-frequency cap (`dfFrac`) drops
  * non-discriminating grams entirely (a gram in 40% of documents
  * separates nothing); (2) IMPACT-ORDERED truncation (`postMax`,
  * Anh & Moffat-style) keeps only the top-tf postings per surviving
  * gram, so per-gram join fan-out is absolutely bounded — scoring runs
  * against the indexed postings, which is what an impact-sorted system
  * serves; (3) the query set is an absolute window (`qMod` within
  * `qMax`) because queries are a WORKLOAD, not the corpus — per-query
  * cost is Σ_g min(df(g), postMax), linear in the query batch.
  * Measured on the 10× replica corpus (fixed vocabulary, df ×10):
  * unbounded form 200 s, bounded form 15 s for a 100-query batch, sf0.01 results
  * hash-identical (both truncation knobs inactive at toy df).
  * Norms are over the indexed (post-truncation) vectors on both
  * engines; cosine is the standard exact-integer discipline.
  */
object SparseSim {

  def topK(docs: DataFrame, qMod: Long = 50, k: Int = 5,
           dfFrac: Double = 0.4, postMax: Int = 1000,
           qMax: Long = 5000): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // I14 contraction: identical texts have identical tf vectors, so
    // the index and ALL dot products run over distinct CONTENTS; doc
    // pairs come back through membership joins with the content's cos
    // (one cheap row each — the gram-level accumulation, ~|A∩B| rows
    // per pair, is paid once per content pair instead of once per
    // replica pair). df/caps count contents — for an impact-ordered
    // index that IS the right unit: duplicate postings carry no
    // information. Same-content neighbors ride the (c, c) self-dot;
    // the true self-pair drops after expansion.
    val withCh = docs
      .select(col("doc_id"), col("text"), md5(col("text")).as("ch"))
    // content-count-sized (hash, id) frame, reused 3× — materialize
    // once; the text-bearing scan stays lazy
    val reps = withCh.groupBy(col("ch")).agg(min(col("doc_id")).as("rep"))
      .localCheckpoint(true)
    val members = withCh.join(reps, Seq("ch"))
      .select(col("rep"), col("doc_id"))
      // two consumers (query routing + candidate expansion) — un-cut,
      // each re-ran the doc scan + md5 + reps join. Narrow id pairs.
      .localCheckpoint(true)
    val repDocs = withCh
      .join(reps.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val grams = repDocs
      .repartition(par, col("doc_id"))
      // native one-pass bigram array (I17)
      .select(col("doc_id"),
        explode(graft.functions.TextNative.bigramsL(col("text"))).as("gram"))
    val tf = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = repDocs.agg(count(lit(1)).as("n_docs"))
    val keptGrams = tf.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs").cast("double") * dfFrac)
      .select(col("gram"))
    val wPost = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gram")).orderBy(col("tf").desc, col("doc_id"))
    val kept = tf.join(keptGrams, Seq("gram"))
      .withColumn("pr", row_number().over(wPost))
      .filter(col("pr") <= postMax)
      .drop("pr")
      // the truncated posting table feeds THREE consumers (norms, the
      // query-side postings, the corpus side of the dot join) — un-cut,
      // each re-ran tokenize + tf + df-gate + impact window (35 parquet
      // scans / 83 exchanges in the r14 plan audit). Postings are
      // absolutely bounded per gram (postMax) — index-sized, not
      // corpus-sized.
      .localCheckpoint(true)
    val norms = kept.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("norm2"))
      // content-count-sized; read by both the query-norm broadcast and
      // the corpus-norm join
      .localCheckpoint(true)

    val qDocs = members
      .filter(col("doc_id") % qMod === 0 && col("doc_id") < qMax)
      .select(col("doc_id").as("q_id"), col("rep").as("qrep"))
    val qPost = qDocs.select(col("qrep")).distinct()
      .join(kept.withColumnRenamed("doc_id", "qrep"), Seq("qrep"))
      .select(col("qrep"), col("gram"), col("tf").as("tfq"))
    val dots = qPost.join(kept, Seq("gram"))
      .groupBy(col("qrep"), col("doc_id"))
      .agg(sum(col("tfq") * col("tf")).as("dot"))
    val qNorms = norms.select(col("doc_id").as("qrep"), col("norm2").as("qn2"))
    val contentCos = dots
      // qNorms is WORKLOAD-sized (≤ qMax/qMod rows) — always broadcastable
      .join(broadcast(qNorms), Seq("qrep"))
      // norms is content-count-sized: NO forced hint — at small scale AQE
      // broadcasts it anyway (it's under the threshold), at 100 TB a
      // forced broadcast of a billions-row frame is an executor OOM, and
      // the planner must be free to shuffle `dots` on doc_id instead
      .join(norms, Seq("doc_id"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("qn2").cast("double")) * sqrt(col("norm2").cast("double"))))
      .select(col("qrep"), col("doc_id").as("crep"), col("cos"))
    val expanded = qDocs.join(contentCos, Seq("qrep"))
      .join(members.select(col("rep").as("crep"), col("doc_id")), Seq("crep"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"), col("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("doc_id"))
    expanded
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
