package graft

import graft.ops.LmQuality

/** Hand-computed stupid-backoff bit accounting for E50.
  *
  * Train slice (doc_id % 5 != 0): docs 1 "a b a b", 2 "a a".
  * Model: c1(a)=4, c1(b)=2, T=6 (bl(T)=3);
  *        c2(a,b)=2, c2(b,a)=1, c2(a,a)=1.
  */
class LmQualitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b"), // train
    (2L, "a a"),     // train
    (5L, "a b z"),   // held out: seen bigram + OOV token
    (10L, "q"),      // held out: no pairs at all
    (15L, "b b"),    // held out: unseen bigram, seen unigram → backoff
    (20L, "a b z")   // duplicate content of doc 5, also held out
  ).toDF("doc_id", "text")

  test("E50: seen-bigram, backoff, and OOV code lengths are exact bits") {
    val out = LmQuality.score(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc1: (a,b)=bl(4)-bl(2)=1 twice, (b,a)=bl(2)-bl(1)=1 → 3 bits / 3
    assert(out(1L) == ((3L, 3L, 1000L)))
    // doc2: (a,a)=bl(4)-bl(1)=2 → 2 bits / 1
    assert(out(2L) == ((1L, 2L, 2000L)))
    // doc5: (a,b)=1, (b,z) OOV = bl(6)+8 = 11 → 12 bits / 2
    assert(out(5L) == ((2L, 12L, 6000L)))
    // doc10: single token, no pairs
    assert(out(10L) == ((0L, 0L, -1L)))
    // doc15: (b,b) backoff = bl(6)-bl(2)+4 = 5 → 5 bits / 1
    assert(out(15L) == ((1L, 5L, 5000L)))
  }

  test("E50: duplicate contents score identically via the contraction") {
    val out = LmQuality.score(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(20L) == out(5L))
  }

  test("E52: tercile buckets split each language at value boundaries") {
    val out = LmQuality.perplexityBuckets(
      graft.sources.Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rs) =>
      val by = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      // buckets are value-disjoint and ordered head < middle < tail
      for {
        h <- by.get("head"); m <- by.get("middle")
      } assert(h.max < m.min, s"$lang head/middle overlap")
      for {
        m <- by.get("middle"); t <- by.get("tail")
      } assert(m.max < t.min, s"$lang middle/tail overlap")
      // head mass reaches at least a third (ties can push it past)
      assert(by("head").length * 3 >= rs.length,
        s"$lang head covers < 1/3")
    }
  }

  test("E50: train-slice weighting — held-out text contributes no counts") {
    // If doc 5's z leaked into the model, (b,z) would not be OOV.
    // Re-score with z PRESENT in a train doc: backoff replaces OOV and
    // the bigram (b,z) itself becomes seen for doc 21's pair.
    val withZ = docs.union(Seq((3L, "b z")).toDF("doc_id", "text"))
    val out = LmQuality.score(withZ).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // model now: c1 a=4 b=3 z=1, T=8 (bl=4); c2 (b,z)=1
    // doc5: (a,b)=bl(4)-bl(2)=1, (b,z)=bl(3)-bl(1)=1 → 2 bits
    assert(out(5L) == 2L)
  }
}
