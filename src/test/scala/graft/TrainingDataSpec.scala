package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainingData
import graft.sources.Tables

/** Semantic properties of the E20–E25 training-data prep operators. */
class TrainingDataSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("chunking tiles every token and overlaps by chunk minus stride") {
    val doc = (1 to 95).map(i => s"w$i").mkString(" ")
    val chunks = TrainingData.chunk(docsDf(1L -> doc), chunkTokens = 40,
      strideTokens = 30).collect()
    // 95 tokens, stride 30 → ceil((95-40)/30)+1 = 3 chunks
    assert(chunks.length == 3)
    assert(chunks.map(_.getLong(3)).toSeq == Seq(40L, 40L, 35L))
    // chunk i starts at token i*30+1: overlap of 10 tokens with previous
    val texts = chunks.map(_.getString(2))
    assert(texts(0).startsWith("w1 ") && texts(1).startsWith("w31 ") &&
      texts(2).startsWith("w61 "))
    assert(texts(0).endsWith(" w40") && texts(1).endsWith(" w70") &&
      texts(2).endsWith(" w95"))
    // a short doc still yields exactly one (remainder) chunk
    val short = TrainingData.chunk(docsDf(2L -> "a b c"), 40, 30).collect()
    assert(short.length == 1 && short(0).getString(2) == "a b c" &&
      short(0).getLong(3) == 3L)
  }

  test("gopher gate flags repetition, passes diverse text") {
    val diverse = (1 to 60).map(i => s"tok$i").mkString(" ")
    val repetitive = Seq.fill(30)("spam ham").mkString(" ")
    val out = TrainingData.gopherQuality(docsDf(1L -> diverse, 2L -> repetitive))
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(out(1L) == 1L, "diverse doc must pass")
    assert(out(2L) == 0L, "half-duplicate-token doc must fail")
  }

  test("pii scrub counts injected emails and phones") {
    // doc_id 77 hits both injectors (77 % 7 == 0, 77 % 11 == 0)
    val out = TrainingData.piiScrub(
      docsDf(77L -> "plain words only", 5L -> "no pii here"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(77L) == (1L, 1L))
    assert(out(5L) == (0L, 0L))
  }

  test("hash split is deterministic and roughly 80/10/10") {
    val docs = Tables.documents(spark, sf)
    val out = TrainingData.hashSplit(docs).collect()
    val bySplit = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    assert(TrainingData.hashSplit(docs).collect().toSeq == out.toSeq,
      "split must be stable across runs")
  }

  test("contamination finds only docs sharing an n-gram with the eval set") {
    val docs = docsDf(
      0L -> "alpha beta gamma delta",          // eval (0 % 97 == 0)
      1L -> "x y alpha beta z",                // shares bigram "alpha beta"
      2L -> "p q r s t u")                     // shares nothing
    val out = TrainingData.contamination(docs, gram = 2, evalMod = 97)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L))
  }

  test("fuzzy lookup ranks an injected near-duplicate name first") {
    import spark.implicits._
    val recs = Seq(
      (0L, "blue anvil"),      // query (0 % 199 == 0)
      (1L, "blue anvel"),      // dist 1 — must rank first
      (2L, "blue anvils"),     // dist 1 — ties on dist, loses on id
      (3L, "blue abacus"),     // dist > 2 — excluded
      (4L, "green anvil"))     // different block — never considered
      .toDF("rid", "nm")
    val out = graft.ops.FuzzyMatch.fuzzyLookup(recs, "rid", "nm").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("dup-span removal drops exactly the covered tokens and keeps order") {
    // two docs sharing the 3-gram "a b c" (corpus count 2 -> dup);
    // everything else unique. Doc 1: tokens 1-3 covered; doc 2: the
    // shared gram sits mid-doc (tokens 3-5 covered).
    val docs = docsDf(
      1L -> "a b c x1 y1 z1",
      2L -> "p2 q2 a b c r2")
    val out = TrainingData.removeDupSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 6L && out(1L)._2 == 3L)
    assert(out(2L)._1 == 6L && out(2L)._2 == 3L)
    // survivors reassemble in original order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(out(1L)._3 == md5hex("x1 y1 z1"))
    assert(out(2L)._3 == md5hex("p2 q2 r2"))

    // removal is exactly E29's detection: n_removed == covered_tokens
    // for every real document
    val real = Tables.documents(spark, sf)
    val rem = TrainingData.removeDupSpans(real)
      .select(col("doc_id"), col("n_removed"))
    val cov = TrainingData.dupSpanCoverage(real)
      .select(col("doc_id"), col("covered_tokens"))
    val disagree = rem.join(cov, Seq("doc_id"))
      .filter(col("n_removed") =!= col("covered_tokens")).count()
    assert(disagree == 0L)
  }

  test("stratified sample takes at most perKey per language, deterministically") {
    val docs = Tables.documents(spark, sf)
    val out = TrainingData.stratifiedSample(docs, perKey = 7).collect()
    val perLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ <= 7))
    assert(out.forall(_.getLong(2) <= 7L))
    assert(TrainingData.stratifiedSample(docs, perKey = 7).collect().toSeq
      == out.toSeq)
  }

  test("training-data pipeline composes: curate -> chunk -> pack -> split") {
    // the end-to-end user story on real tables: curation keepers feed
    // chunking, packing, and the split — schemas line up, every stage
    // is non-empty, and the whole chain is deterministic across runs
    val docs = Tables.documents(spark, sf)
    def run() = {
      val keepers = graft.ops.Curation.curateFull(docs).select("doc_id")
      val kept = docs.join(keepers, Seq("doc_id"), "left_semi")
      val chunks = TrainingData.chunk(kept)
      val packed = TrainingData.packSequences(kept)
      val split = TrainingData.hashSplit(kept)
      (kept.count(), chunks.count(), packed.count(),
        split.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
    }
    val (nKept, nChunks, nPacked, splits) = run()
    assert(nKept > 0 && nKept < docs.count(), "curation must gate something")
    assert(nChunks >= nKept, "every kept doc yields at least one chunk")
    assert(nPacked == nKept, "packing emits one row per doc")
    assert(splits.map(_._2) == Set("train", "val", "test"))
    assert(run() == ((nKept, nChunks, nPacked, splits)), "pipeline must be deterministic")
  }

  test("E51: deterministic shuffle is a layout-independent permutation") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = TrainingData.deterministicShuffle(docs, nShards = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a permutation: every doc exactly once
    assert(rows.map(_._1).toSet.size == n.toInt && rows.length == n.toInt)
    // within each shard, positions are contiguous 0..count-1
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong))
    }
    // every shard populated, and no shard hogs the corpus (loose 3×
    // bound on the binomial split — deterministic given the fixed seed)
    val sizes = rows.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 4 && sizes.max < 3 * sizes.min)
    // physical-layout independence: a different input partitioning and
    // row order must produce the identical (doc, shard, pos) triples
    val reshuffled = TrainingData.deterministicShuffle(
      docs.repartition(13, col("n_chars")), nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reshuffled.toSet == rows.toSet)
  }

  test("E59: boilerplate df is per-source; the threshold is inclusive") {
    import spark.implicits._
    // s1: four docs sharing ONLY the header trigram (df 4/4 → boiler);
    // each body trigram is unique (df 1/4 → not). s2: the header
    // appears in 2 of its 4 docs — df exactly the inclusive 50%
    // threshold, flagged on s2's OWN denominator; s2 singletons sit at
    // 25% and stay clean.
    val docs = (0 until 4).map(i =>
      (i.toLong, s"alpha beta gamma u$i v$i w$i", "s1")) ++ Seq(
      (10L, "alpha beta gamma solo tail here", "s2"),
      (11L, "alpha beta gamma other end bit", "s2"),
      (12L, "zz yy xx ww", "s2"),
      (13L, "qq rr ss tt", "s2"))
    val out = TrainingData.sourceBoilerplate(
      docs.toDF("doc_id", "text", "source")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    (0 until 4).foreach { i =>
      assert(out(i.toLong) == (4L, 1L, 250000L),
        s"s1 doc $i: header gram only, 1 of 4 grams")
    }
    assert(out(10L) == (4L, 1L, 250000L),
      "50% df meets the inclusive threshold on s2's denominator")
    assert(out(11L) == (4L, 1L, 250000L))
    assert(out(12L) == (2L, 0L, 0L), "singletons at 25% stay clean")
    assert(out(13L) == (2L, 0L, 0L))
  }
}
