package graft

import graft.ops.CorpusStats

/** Hand-computed doubling-bucket semantics for the E56 Zipf profile and
  * E57 Heaps growth curve (the oracle twins prove Spark↔DuckDB parity;
  * these pin the MATH). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("E56: frequency doubling-histogram, top-down shares, zipf constant") {
    // freqs: a=4 (bits 3), b=2 (bits 2), c=1 (bits 1); total mass 7
    val docs = Seq((0L, "a a a a"), (1L, "b b c")).toDF("doc_id", "text")
    val out = CorpusStats.zipfProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // (n_words, n_occ, min_f, max_f, cum_share_ppm, zipf_const_bits)
    assert(out(3L) == (1L, 4L, 4L, 4L, 1000000L * 4 / 7, 3L))
    assert(out(2L) == (1L, 2L, 2L, 2L, 1000000L * 6 / 7, 2L))
    assert(out(1L) == (1L, 1L, 1L, 1L, 1000000L, 1L))
  }

  test("E57: vocabulary growth at doubling doc prefixes, marginal rates") {
    // first-seen docs: x→0 y→0 z→1 q→2 w→3; prefix slabs k=0:{0},
    // k=1:{1}, k=2:{2,3}
    val docs = Seq((0L, "x y"), (1L, "x z"), (2L, "x q"), (3L, "y w"))
      .toDF("doc_id", "text")
    val out = CorpusStats.heapsGrowth(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // (n_docs, n_tokens, n_vocab, new_vocab, new_tokens, new_rate_ppm)
    assert(out(0L) == (1L, 2L, 2L, 2L, 2L, 1000000L))
    assert(out(1L) == (2L, 4L, 3L, 1L, 2L, 500000L))
    assert(out(2L) == (4L, 8L, 5L, 2L, 4L, 500000L))
  }

  test("E57: a saturated corpus's marginal new-word rate collapses to zero") {
    val docs = (0L until 16L).map(i => (i, "same five words every time"))
      .toDF("doc_id", "text")
    val rows = CorpusStats.heapsGrowth(docs).collect()
    assert(rows.head.getLong(6) == 1000000L)  // slab 0 is all-new
    assert(rows.last.getLong(6) == 0L)        // deep slabs add nothing
    assert(rows.map(_.getLong(3)).max == 5L)  // vocab pinned at 5
  }

  test("E62: TV distance matches the hand rational; identical sources 0") {
    // a: p=(x:2/3, y:1/3); b: q=(x:1/2, z:1/2)
    // TV = (|2/3-1/2| + 1/3 + 1/2)/2 = 1/2; via Σmin: 1 - 3/6
    val docs = Seq(("a", "x x y"), ("b", "x z"), ("c", "x x y"))
      .toDF("source", "text")
    val out = CorpusStats.sourceTvMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", "b")) == ((1L, 500000L)))
    assert(out(("a", "c")) == ((2L, 0L)))   // identical distributions
    assert(out(("b", "c")) == ((1L, 500000L)))
  }

  test("E63: leakage containments are directional; disjoint pairs absent") {
    // b's single shingle is fully contained in a's two; c shares none
    val docs = Seq(("a", "w1 w2 w3 w4"), ("b", "w1 w2 w3"), ("c", "x y z"))
      .toDF("source", "text")
    val out = CorpusStats.sourceLeakageMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6)))).toMap
    assert(out == Map(("a", "b") -> ((1L, 500000L, 1000000L))))
  }

  test("E66: Simpson diversity — exact thirds, all-same 1e6, distinct 0") {
    val docs = Seq(("a", "x x y"), ("b", "z z z"), ("c", "p q r"))
      .toDF("source", "text")
    val out = CorpusStats.sourceDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // a: Σf(f-1)=2, T(T-1)=6 -> 333333 / 666667
    assert(out("a") == ((2L, 3L, 333333L, 666667L)))
    assert(out("b") == ((1L, 3L, 1000000L, 0L)))
    assert(out("c") == ((3L, 3L, 0L, 1000000L)))
  }

  test("E64: novelty separates unique, shared, and singleton documents") {
    // shingles: d0 {abc, bcd}, d1 {abc}, d2 {xyz}; df: abc=2, bcd=1, xyz=1
    val docs = Seq((0L, "a b c d"), (1L, "a b c"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val out = CorpusStats.docNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(0L) == ((2L, 1L, 500000L, 2L, 1500000L)))
    assert(out(1L) == ((1L, 0L, 0L, 2L, 2000000L)))
    assert(out(2L) == ((1L, 1L, 1000000L, 1L, 1000000L)))
  }

  test("E68: fertility — exact ppm, empty-token runs filtered, 0-token pinned") {
    val docs = Seq(
      (0L, "ab cd", "en", "a"),      // 5 chars, 2 toks, bpe 2
      (1L, "a  b", "en", "a"),       // 4 chars, 2 toks (empty dropped), bpe 1
      (2L, " ", "de", "b"))          // 1 char, 0 toks, bpe 1 -> pinned
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusStats.tokenizerFertility(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // en/a: 9 chars, 4 toks, 3 bpe -> cpt 2250000, bpt 750000
    assert(out(("en", "a")) == ((2L, 9L, 4L, 3L, 2250000L, 750000L)))
    assert(out(("de", "b")) == ((1L, 1L, 0L, 1L, 0L, 0L)))
  }

  test("E67: snapshot TV — hand thirds, identical halves 0, empty half 10^6") {
    val docs = Seq(
      // s: halves "a a b" vs "a b b" -> smin 6 of 9 -> tv 1/3
      (0L, "a a b", "s"), (1L, "a b b", "s"),
      // same: identical halves -> 0
      (2L, "x y", "same"), (3L, "x y", "same"),
      // lone: only the even half exists -> pinned 10^6
      (4L, "q r", "lone"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.snapshotTvDrift(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s") == ((3L, 3L, 333333L)))
    assert(out("same") == ((2L, 2L, 0L)))
    assert(out("lone") == ((2L, 0L, 1000000L)))
  }
}
