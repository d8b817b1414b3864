package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E41 — EXACT set-similarity self-join via prefix filtering
  * (AllPairs / PPJoin, Bayardo et al. WWW'07): every pair with shingle
  * Jaccard ≥ t, with NO false negatives — the deterministic complement
  * of MinHash-LSH (E3), which trades recall for cost. The oracle is the
  * brute-force all-shared-gram join, so the hash check proves
  * exactness, not just cross-engine mechanics.
  *
  * The filter: order each doc's distinct grams by global rarity
  * (df asc, gram asc — one TOTAL order both engines agree on) and keep
  * only the first L − ⌈t·L⌉ + 1 as its PREFIX. Two sets with
  * Jaccard ≥ t must overlap inside their prefixes (pigeonhole), so the
  * candidate join runs on prefix grams only — the RAREST ~(1−t) of
  * each doc, exactly the grams with the shortest posting lists. The
  * threshold is integer math throughout: prefix length
  * L − (tNum·L + tDen−1) div tDen + 1 and the final gate
  * tDen·inter ≥ tNum·(szA + szB − inter); jaccard is emitted as one
  * IEEE division for the report only.
  *
  * Scale: one (doc,gram) shuffle, one gram-df shuffle, a per-doc
  * ordering window (doc-sized partitions), then the candidate join on
  * rare grams and a verification join whose row count is Σ|A∩B| over
  * candidates. No all-pairs anywhere; every stage is bounded by
  * posting-list geometry, the same discipline as E38/E39.
  */
object PrefixJoin {

  def jaccardJoin(docs: DataFrame, tNum: Int = 7, tDen: Int = 10,
                  dupMod: Long = 250): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val grams = Dedup.withSyntheticDups(docs, dupMod)
      .repartition(par, col("doc_id"))
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextNative.ngramsL(col("text"), 3)).as("g"))
      .distinct()
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfTab = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    val prefix = grams.join(dfTab, Seq("g"))
      .withColumn("pos", row_number().over(wDoc))
      .join(sizes, Seq("doc_id"))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) div $tDen") + 1)
      .select(col("g"), col("doc_id"))
    val cand = prefix.select(col("g"), col("doc_id").as("id1"))
      .join(prefix.select(col("g"), col("doc_id").as("id2")), Seq("g"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    val inter = cand
      .join(grams.select(col("doc_id").as("id1"), col("g")), Seq("id1"))
      .join(grams.select(col("doc_id").as("id2"), col("g")), Seq("id2", "g"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), Seq("id2"))
      .filter(lit(tDen) * col("n_inter") >=
        lit(tNum) * (col("sz1") + col("sz2") - col("n_inter")))
      .select(col("id1"), col("id2"), col("n_inter").cast(LongType).as("n_inter"),
        (col("n_inter") / (col("sz1") + col("sz2") - col("n_inter")))
          .as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }
}
