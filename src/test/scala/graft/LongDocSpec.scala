package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, TextAnalysis}

/** Long-document (3×10⁴ tokens) guard for the dedup/quality paths that
  * previously used array_distinct: its per-row pairwise compares are
  * O(n²) in document length (9×10⁸ string compares per 30k-token doc —
  * hours, not seconds). The replacements (exploded hash-aggregate
  * dedup, sort + boundary count) are linear / O(n log n) per doc, so
  * this whole suite finishes in seconds; the generous wall bound trips
  * only if a quadratic per-row scan sneaks back in.
  */
class LongDocSpec extends SparkSpec {

  /** ~30k tokens drawn cyclically from a 997-word vocabulary, shifted
    * per doc so documents overlap but differ. */
  private def longDocs(n: Int, tokens: Int = 30000) = {
    import spark.implicits._
    (0 until n).map { d =>
      val text = (0 until tokens).map(i => s"w${(i + d * 7) % 997}").mkString(" ")
      (d.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("long-doc simhash, quality, curation, and LSH verify stay linear per row") {
    val t0 = System.nanoTime()
    val docs = longDocs(4)

    // simhash is a pure function of the distinct token SET: a 30k-token
    // doc and its 997-word distinct vocabulary must hash identically.
    val distinctOnly = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        100L, (0 until 997).map(i => s"w$i").mkString(" ")))),
      docs.schema)
    val sh = Dedup.simhash(docs.unionByName(distinctOnly)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(100L), "simhash must depend only on the distinct token set")

    // quality scoring: exact distinct-token count on a long doc.
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_distinct"))).toMap
    assert(q.values.forall(_ == 997L), s"expected 997 distinct tokens, got $q")

    // curation gate reads the same distinct count (docs exceed the
    // default maxTokens=1000 and sit below the default distinct ratio
    // 0.05 at 997/30000, so widen both for the test).
    val curated = Curation.curate(docs.withColumn("lang", lit("en")),
      maxTokens = 50000, minDistinctRatio = 0.01)
    assert(curated.count() == 4L)

    // lshVerify: dupMod=1 injects an exact duplicate per doc; every
    // (id, id+10M) candidate must verify at jaccard 1.0 via the
    // exploded-shingle-set path.
    val verified = Dedup.lshVerify(docs, dupMod = 1).collect()
    (0 until 4).foreach { d =>
      val hit = verified.find(r =>
        r.getLong(0) == d.toLong && r.getLong(1) == d.toLong + 10000000L)
      assert(hit.isDefined, s"exact-dup pair for doc $d not verified")
      assert(hit.get.getDouble(hit.get.fieldIndex("jaccard")) == 1.0d)
    }

    // removal operators stay linear too: both are explode+join shapes
    // with no per-row pairwise work. 30k-token docs each; the 4 docs
    // share their (shifted) vocabulary so dup grams and common lines
    // genuinely fire.
    val docRemoval = graft.ops.TrainingData.removeDupSpans(docs).collect()
    assert(docRemoval.length == 4 &&
      docRemoval.forall(r => r.getLong(2) > 0L), "expected dup spans removed")
    val lineRemoval = graft.ops.TrainingData.removeCommonLines(docs).collect()
    assert(lineRemoval.length == 4)

    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 180d,
      f"long-doc paths took $elapsedSec%.1f s — quadratic per-row scan suspected")
  }
}
