package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.GraftFunctions._

/** Deduplication family for a training-data pipeline (SURVEY.md §2 E1–E4):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: exact dedup is one hash-shuffle on the content hash;
  * MinHash/LSH shuffles on (band, bucket) so candidate generation never
  * compares across buckets; the quadratic true-Jaccard verify only ever
  * runs on a bounded candidate/sample set. SimHash and signatures are
  * per-row map work in whole-stage codegen.
  */
object Dedup {

  /** Distinct word 3-gram shingles; rows with <3 tokens are dropped (a
    * 2-token doc has no 3-shingle). */
  def withShingles(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("sh", array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ",
            element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
  }

  /** E1 — exact dedup: md5 content groups, keeper = min id. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** E2 — all-pairs n-gram Jaccard on a keyed sample (the exhaustive
    * verify step that LSH candidates would feed at scale). Jaccard is an
    * IEEE division of exact intersection/union counts. */
  def ngramJaccard(docs: DataFrame, sampleMod: Long = 20): DataFrame = {
    val sh = withShingles(docs.filter(col("doc_id") % sampleMod === 0))
      .select(col("doc_id"), col("sh"))
    val a = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val b = sh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    a.join(b, col("id1") < col("id2"))
      .select(
        col("id1"), col("id2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast(LongType).as("n_inter"),
        (size(col("sh1")) + size(col("sh2"))).cast(LongType).as("n_sum"))
      .withColumn("n_union", col("n_sum") - col("n_inter"))
      .withColumn("jaccard", col("n_inter") / col("n_union"))
      .drop("n_sum")
      .orderBy(col("id1"), col("id2"))
  }

  /** MinHash signature columns sig_0..sig_{k-1}: min over shingles of a
    * seeded 32-bit hash. */
  def withMinhashSig(shingled: DataFrame, k: Int): DataFrame =
    (0 until k).foldLeft(shingled) { (df, i) =>
      df.withColumn(s"sig_$i",
        array_min(transform(col("sh"), s => h32(concat(lit(s"$i:"), s)))))
    }

  /** E3 — MinHash+LSH candidate pairs: `bands` bands of `rowsPerBand`
    * signature rows; docs sharing any band bucket become candidates.
    * `dupMod` injects synthetic exact duplicates (id+10_000_000) so the
    * operator's recall is observable on a corpus with no natural dups.
    */
  def minhashLsh(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 2,
                 dupMod: Long = 250): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val withDups = base.unionByName(
      base.filter(col("doc_id") % dupMod === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
    val k = bands * rowsPerBand
    val sig = withMinhashSig(withShingles(withDups), k)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"sig_${b * rowsPerBand + r}").cast("string"))
      struct(lit(b.toLong).as("band"),
        md5(concat_ws("_", parts: _*)).as("bucket"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val l = buckets.select(col("band"), col("bucket"), col("doc_id").as("id1"))
    val r = buckets.select(col("band"), col("bucket"), col("doc_id").as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(countDistinct(col("band")).as("n_shared_bands"))
      .orderBy(col("id1"), col("id2"))
  }

  /** E4 — SimHash fingerprint (`bits`-wide): per-bit majority vote over
    * distinct-token 32-bit hashes. Implemented as an explode + two-level
    * exact-integer aggregation (map-side combine keeps the shuffle tiny:
    * one row per (doc, bit)). */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", h32(col("tok")))
    val votes = toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("bit"))
      .withColumn("vote",
        when(expr("shiftright(h, cast(bit as int)) & 1") === 1, lit(1L))
          .otherwise(lit(-1L)))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("v"))
    votes
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, cast(bit as int))"))
        .otherwise(lit(0L))).as("simhash"))
      .orderBy(col("doc_id"))
  }
}
