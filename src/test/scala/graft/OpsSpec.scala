package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup}
import graft.sources.Tables

/** Semantic properties of the E-section operators beyond oracle parity. */
class OpsSpec extends SparkSpec {

  test("incremental dedup flags every re-crawl copy; fresh docs carry no batch order dependence") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.incrementalLsh(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // every synthetic re-crawl copy (id ≥ 10M) is an exact dup of its
    // corpus original and must be flagged with ≥1 corpus candidate
    val recrawls = out.filter(_._1 >= 10000000L)
    assert(recrawls.nonEmpty)
    recrawls.foreach { case (id, (nc, _, dup)) =>
      assert(nc >= 1L && dup == 1L, s"re-crawl $id not flagged: $out")
    }
    // output covers exactly the batch (re-crawls + the %10=7 slice)
    assert(out.keySet.forall(id => id >= 10000000L || id % 10 == 7))
  }

  test("band index persists to parquet and the loaded copy probes identically") {
    val docs = Tables.documents(spark, sf)
    val universe = Dedup.withSyntheticDups(docs)
      .filter(size(split(col("text"), " ")) >= 3)
    val isNew = col("doc_id") >= 10000000L || col("doc_id") % 10 === 7
    val corpusIdx = Dedup.bandIndex(universe.filter(!isNew))
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_bandidx")
    try {
      val dir = tmpRoot.resolve("idx").toString
      corpusIdx.write.partitionBy("band").parquet(dir)
      val loaded = spark.read.parquet(dir)
        .select(col("doc_id"), col("band").cast("long").as("band"), col("bucket"))
      // the stored artifact is the in-memory derivation, row for row
      assert(loaded.exceptAll(corpusIdx).isEmpty &&
        corpusIdx.exceptAll(loaded).isEmpty)
      // probing the LOADED index yields the same corpus candidates
      val batchB = Dedup.bandIndex(universe.filter(isNew))
      def cands(idx: org.apache.spark.sql.DataFrame) = batchB
        .join(idx.select(col("band"), col("bucket"),
          col("doc_id").as("other_id")), Seq("band", "bucket"))
        .select("doc_id", "other_id").distinct()
      assert(cands(loaded).exceptAll(cands(corpusIdx)).isEmpty &&
        cands(corpusIdx).exceptAll(cands(loaded)).isEmpty)
      assert(cands(loaded).count() > 0)
    } finally {
      // parquet dirs nest (idx/band=*/part-*) — delete bottom-up
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpRoot).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("minhash LSH recalls injected exact duplicates on all bands") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLsh(docs, dupMod = 250).collect()
    val injected = docs.filter(col("doc_id") % 250 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    injected.foreach { id =>
      val hit = pairs.find(r => r.getLong(0) == id && r.getLong(1) == id + 10000000L)
      assert(hit.isDefined, s"dup pair for $id not recalled")
      assert(hit.get.getLong(2) == 4L, "exact dup must share all 4 bands")
    }
  }

  test("simhash of identical texts is identical, and near docs differ in few bits") {
    val docs = Tables.documents(spark, sf).limit(50)
    val doubled = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 5000L).as("doc_id"), col("text")))
    val sh = Dedup.simhash(doubled).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      if (sh.contains(i.toLong))
        assert(sh(i.toLong) == sh(i.toLong + 5000L))
    }
  }

  test("brute-force ANN ranks a vector's exact duplicate first") {
    val emb = Tables.embeddings(spark, sf)
    // clone vec 3 as vec_id 9999: its top hit must be vec 3 with cos ~ 1
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val top = Ann.bruteForceTopK(emb.unionByName(dup), nQueries = 4, k = 1)
      .filter(col("q_id") === 3).collect()
    assert(top.length == 1)
    assert(top(0).getLong(1) == 9999L)
    assert(math.abs(top(0).getDouble(2) - 1.0) < 1e-9)
  }

  test("E54: embedding contamination screen recovers exactly the leaked evals") {
    val out = Ann.embedContamination(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val evalIds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val leaked = evalIds.filter(k => (k / 50) % 4 == 0)
    // every leaked eval is found, pointing at its shifted copy with cos ~ 1;
    // random testdata vectors never reach cos >= 0.999, so nothing else fires
    assert(out.map(_._1).toSet == leaked)
    out.foreach { case (evalId, nLeaks, maxCos, leakId) =>
      assert(nLeaks == 1L && leakId == evalId + 10000000L)
      assert(math.abs(maxCos - 1.0) < 1e-9)
    }
  }

  test("learned-IVF ANN at nprobe=2 reaches recall >= 0.9 vs brute force") {
    // The testdata embeddings are isotropic random vectors (labels carry
    // no cosine geometry), so NO coarse quantizer can bound recall
    // there — the operator contract is tested on vectors with real
    // cluster structure: 8 seeded centroids + small noise.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(8, 64)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val c = centroids(i % 8)
      val v = c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val truth = Ann.bruteForceTopK(emb, nQueries = 10, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = graft.ml.EmbeddingClustering.assignCellsDf(emb, k = 8)
    val got = Ann.ivfTopKLearned(emb, cells, nQueries = 10, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall below 0.9 (hit ${truth.count(got.contains)}/${truth.size})")
  }

  test("E60: canonical election keeps one longest member per cluster") {
    val docs = Tables.documents(spark, sf)
    val rows = Dedup.canonicalize(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // exactly one keep=1 per cluster, and it IS the canonical
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val keepers = members.filter(_._5 == 1L)
      assert(keepers.length == 1, s"cluster $cid keepers: $keepers")
      assert(keepers.head._1 == keepers.head._4)
      val canon = keepers.head
      // the canonical is a max-length member with the smallest id there
      val maxLen = members.map(_._3).max
      assert(canon._3 == maxLen)
      assert(canon._1 == members.filter(_._3 == maxLen).map(_._1).min)
      // every member maps to the same canonical
      assert(members.forall(_._4 == canon._1))
    }
    // injected exact copies always lose to their base on the id tie
    rows.filter(_._1 >= 10000000L).foreach { r =>
      assert(r._5 == 0L, s"injected copy ${r._1} must not be canonical")
    }
  }

  test("E61: impact report reconciles exactly with the canonical election") {
    val docs = Tables.documents(spark, sf)
    val impact = Dedup.dedupImpact(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val droppedReal = Dedup.canonicalize(docs).collect()
      .filter(r => r.getLong(0) < 10000000L && r.getLong(5) == 0L)
      .map(_.getLong(0)).toSet
    assert(impact.values.map(_._2).sum == droppedReal.size,
      "per-source dropped docs must sum to the real keep=0 members")
    // doc totals reconcile with the raw table per source
    val bySource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(impact.keySet == bySource.keySet)
    impact.foreach { case (s, (nDocs, nDropped, nTok, tokDropped)) =>
      assert(nDocs == bySource(s))
      assert(nDropped >= 0 && nDropped <= nDocs)
      assert(tokDropped >= 0 && tokDropped <= nTok)
    }
  }

  test("LSH clusters assign every injected dup to its base doc's cluster") {
    val docs = Tables.documents(spark, sf)
    val clusters = Dedup.lshClusters(docs, dupMod = 250).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val injected = docs.filter(col("doc_id") % 250 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    injected.foreach { id =>
      assert(clusters.contains(id) && clusters.contains(id + 10000000L))
      assert(clusters(id) == clusters(id + 10000000L),
        s"doc $id and its dup landed in different clusters")
      assert(clusters(id + 10000000L) <= id, "cluster id must be the min member id")
    }
  }

  test("lshVerify scores injected exact duplicates at jaccard 1.0") {
    val docs = Tables.documents(spark, sf)
    val verified = Dedup.lshVerify(docs, dupMod = 250).collect()
    val exactPairs = verified.filter(r => r.getLong(1) == r.getLong(0) + 10000000L)
    assert(exactPairs.nonEmpty)
    exactPairs.foreach { r =>
      assert(math.abs(r.getDouble(5) - 1.0) < 1e-12,
        s"exact dup pair (${r.getLong(0)},${r.getLong(1)}) jaccard ${r.getDouble(5)}")
    }
  }

  test("E70: curation funnel accounts every doc and reconciles with " +
      "curateFull per source") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val funnel = graft.ops.Curation.curationFunnel(docs).collect()
    assert(funnel.map(_.getLong(2)).sum == docs.count(),
      "every document lands in exactly one funnel cell")
    val keptBySource = funnel.filter(_.getString(1) == "7_kept")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val cfBySource = graft.ops.Curation.curateFull(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBySource == cfBySource,
      s"funnel kept must equal the E19 survivors: $keptBySource vs $cfBySource")
    // at least one non-kept reason fires on the real corpus
    assert(funnel.exists(r => r.getString(1) != "7_kept" && r.getLong(2) > 0))
  }

  test("E69: threshold curve is monotone, zero-completes, and matches " +
      "the verify pass pair for pair") {
    val docs = Tables.documents(spark, sf)
    val curve = Dedup.thresholdCurve(docs, dupMod = 250).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(curve.keySet ==
      Set(500000L, 700000L, 800000L, 900000L, 1000000L))
    // exact integer recount from the verify pass's own counts
    val pairsPpm = Dedup.lshVerify(docs, dupMod = 250).collect()
      .map(r => 1000000L * r.getLong(3) / r.getLong(4))
    curve.foreach { case (t, (np, ndocs)) =>
      assert(np == pairsPpm.count(_ >= t), s"pairs at $t")
      assert(ndocs <= 2 * np)
    }
    // monotone non-increasing in the threshold
    val ordered = curve.toSeq.sortBy(_._1).map(_._2._1)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    // the injected exact dups guarantee mass at tau = 1.0
    assert(curve(1000000L)._1 > 0L)
  }

  test("multiprobe SRP recovers a pair straddling exactly one hyperplane") {
    import spark.implicits._
    import graft.functions.SrpSig
    // Construct the straddling pair DETERMINISTICALLY from the exact
    // integer projections: perturb one coordinate just past the weakest
    // projection's zero crossing, leaving every other projection's sign
    // intact. Search coordinates until the flip is clean.
    val rnd = new scala.util.Random(11)
    val a = Array.fill(64)(rnd.nextFloat())
    val s = a.map(x => math.round(x.toDouble * 1e6)) // mirrors GraftFunctions.scaled
    val proj = Array.tabulate(16)(j =>
      (0 until 64).map(i => SrpSig.srpSign(j, i) * s(i)).sum)
    val jStar = proj.indices.minBy(j => math.abs(proj(j)))
    val found = (0 until 64).iterator.flatMap { k =>
      // flip proj(jStar) only: push it past zero with 1% margin
      val deltaS = -SrpSig.srpSign(jStar, k) * math.signum(proj(jStar)) *
        (math.abs(proj(jStar)) * 101L / 100L + 1000L)
      val flipsOk = proj.indices.forall { j =>
        val nd = proj(j) + SrpSig.srpSign(j, k) * deltaS
        if (j == jStar) math.signum(nd) != math.signum(proj(j))
        else (nd >= 0) == (proj(j) >= 0)
      }
      if (flipsOk) Some((k, deltaS)) else None
    }.toSeq.headOption
    assert(found.isDefined, "no clean single-flip coordinate found")
    val (k, deltaS) = found.get
    val b = a.clone(); b(k) = (a(k) + deltaS / 1e6).toFloat
    val pairVecs = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    def pairs(probes: Boolean) =
      Ann.embedCosineDups(pairVecs, dupMod = 1000000L, minCos = 0.9,
        oneBitProbes = probes)
        .select(col("id1"), col("id2")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs(probes = true).contains((1L, 2L)),
      "1-bit probing must recover the straddling pair")
    assert(!pairs(probes = false).contains((1L, 2L)),
      "exact bucketing should miss it (else the pair isn't straddling)")
  }

  test("SemDeDup removes the later twin of a same-cell near-dup pair only") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat())
    val base = vec()
    // 1 and 2 share cell 0 and are exact duplicates; 3 is an exact
    // duplicate of 1 but quantized to ANOTHER cell — SemDeDup by
    // construction must NOT see that cross-cell pair (the published
    // trade: recall is scoped to the cluster).
    val df = Seq(
      (1L, base, 0), (2L, base, 0), (3L, base, 1),
      (4L, vec(), 0), (5L, vec(), 1))
      .toDF("vec_id", "embedding", "cell")
    val out = graft.ops.SemDedup.semanticDups(df)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("exact dedup groups identical content") {
    val docs = Tables.documents(spark, sf).limit(20)
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 7000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
    val groups = Dedup.exact(doubled).collect()
    assert(groups.forall(_.getLong(2) == 2L))
    assert(groups.forall(_.getLong(1) < 7000L))
  }

  test("resample LOCF: a null observation terminates the carry (ASOF semantics)") {
    import spark.implicits._
    // key 1: obs at t=10 (v=100), t=25 (v=null). Grid step 10 → grid
    // points 10 and 20 (from [10,25] floored). Point 20's nearest prior
    // obs is t=10 → 100; a point after the null obs must NOT reach back
    // past it to 100.
    val events = Seq(
      (1L, 10L, Some(100L)), (1L, 25L, None), (1L, 31L, Some(7L)),
      (1L, 40L, None)
    ).toDF("k", "t_us", "v_raw")
      .select(col("k"), col("t_us"), col("v_raw").as("v_cents"))
    val out = graft.ops.Resample.lastValueGrid(events, "k", "t_us", "v_cents", 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((10L, 100L, 1L), (20L, 100L, 1L), (30L, -1L, 0L),
      (40L, -1L, 0L)))
  }

  test("bigram coherence ranks common transitions above unique ones") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t, "en", "s", t.length.toLong)
    val docs = ((0L until 10L).map(i => mk(i, "alpha beta alpha beta alpha beta"))
      :+ mk(99L, "zeta qoph alpha nu"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scores = graft.ops.TextAnalysis.bigramCoherence(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scores(0L) > scores(99L),
      s"common-transition doc must outscore the outlier: $scores")
  }

  test("linear interpolation brackets, extends edges, and honors co-timed obs") {
    import spark.implicits._
    // obs at t=10 (v=100) and t=30 (v=300); grid step 10 → points 10,20,30.
    // 20 interpolates to 200; 10 and 30 sit ON observations.
    val ev = Seq((1L, 10L, 100L), (1L, 30L, 300L))
      .toDF("k", "t_us", "v_cents")
    val out = graft.ops.Resample
      .interpolatedGrid(ev, "k", "t_us", "v_cents", 10L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out == Map(10L -> 100.0, 20L -> 200.0, 30L -> 300.0))
  }

  test("dup-span coverage unions overlapping dup-gram intervals exactly") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t, "en", "s", t.length.toLong)
    // "a b c" is the only cross-doc dup 3-gram between docs 1 and 2;
    // doc 3 repeats every one of its 3-grams (full self-overlap).
    val docs = Seq(
      mk(1L, "a b c d e"),
      mk(2L, "x a b c y"),
      mk(3L, "a b c a b c a b"),
      mk(4L, "p q r s t")).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TrainingData.dupSpanCoverage(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(1L) == ((1L, 3L, 600000L)))   // 3 of 5 tokens covered
    assert(out(2L) == ((1L, 3L, 600000L)))
    assert(out(3L) == ((6L, 8L, 1000000L)))  // overlapping dups → whole doc
    assert(out(4L) == ((0L, 0L, 0L)))        // no dup grams at all
  }

  test("sequence packing assigns boundary-straddling docs to both sequences") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t, "en", "s", t.length.toLong)
    val docs = Seq(
      mk(1L, "t t t"), mk(2L, "t t t t"), mk(3L, "t t t t t"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // one shard, budget 6: cum = 3, 7, 12
    val out = graft.ops.TrainingData.packSequences(docs, budget = 6, shards = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(1L) == ((0L, 0L, 1L)))  // fits in seq 0
    assert(out(2L) == ((3L, 0L, 2L)))  // starts at offset 3, spills into seq 1
    assert(out(3L) == ((1L, 1L, 1L)))  // starts inside seq 1, ends at 11
  }

  test("DSIR importance scoring selects the target-like raw document") {
    import spark.implicits._
    val mk = (id: Long, t: String, src: String) =>
      (id, t, "en", src, t.length.toLong)
    val docs = (
      (0L until 5L).map(i => mk(i, "alpha beta alpha beta alpha beta", "src0")) ++
      (10L until 15L).map(i => mk(i, "gamma delta gamma delta gamma delta", "srcX"))
      :+ mk(20L, "alpha beta alpha beta alpha beta", "srcX"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TrainingData.dsirScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // the raw doc written in the target's bigram distribution must
    // outscore the off-domain raw docs and be the only one selected
    assert(out(20L)._1 > out(10L)._1)
    assert(out(20L)._2 == 1L)
    assert((10L until 15L).forall(out(_)._2 == 0L))
    assert(out(0L)._2 == 0L) // target docs are never "selected"
  }

  test("containment dominates Jaccard on every candidate pair; dups hit 1.0") {
    val docs = Tables.documents(spark, sf)
    val cont = Dedup.lshContainment(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val jac = Dedup.lshVerify(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(5))).toMap
    assert(cont.keySet == jac.keySet && cont.nonEmpty)
    cont.foreach { case (pair, (nInter, nMin, ppm)) =>
      val (jInter, j) = jac(pair)
      assert(nInter == jInter)
      // min(|A|,|B|) ≤ |A∪B| ⇒ containment ≥ jaccard, always
      assert(ppm.toDouble / 1e6 >= j - 1e-9, s"$pair: $ppm < $j")
      assert(nInter <= nMin)
    }
    // the injected exact dups are full-containment pairs
    assert(cont.exists { case (_, (_, _, ppm)) => ppm == 1000000L })
  }

  test("lshClusters auto-escalates to star contraction past the iteration budget") {
    // maxIter = 0 forces the escalation path on EVERY component; the
    // result must still be the exact min-label closure (same clusters
    // as the dedicated scalable variant), not an error or a partial fix.
    val docs = Tables.documents(spark, sf).limit(200)
    val escalated = Dedup.lshClusters(docs, dupMod = 50, maxIter = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val reference = Dedup.lshClustersScalable(docs, dupMod = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(escalated == reference && escalated.nonEmpty)
  }

  test("sourceCap: under-full sources kept whole, boundary ties by doc_id") {
    import spark.implicits._
    val docs = Seq(
      // source "a": 3 docs < k=2? use k=2 → capped; "b": 1 doc → whole
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), (4L, "a", 50L),
      (9L, "b", 7L)
    ).toDF("doc_id", "source", "n_chars")
    val out = graft.ops.Curation.sourceCap(docs, k = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // all of "a" ties at 100: the two smallest doc_ids win; "b" (<k) whole
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("E49: RRF fuses by rank only — hand-computed scores, both-lists bonus") {
    import spark.implicits._
    // query 1: lexical ranks a,b,c ; semantic ranks b,d
    val lex = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L))
      .toDF("q_id", "item_id", "rnk")
    val sem = Seq((1L, "b", 1L), (1L, "d", 2L))
      .toDF("q_id", "item_id", "rnk")
    val out = graft.ops.Fusion.rrfFuse(Seq(lex, sem), k = 10)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val c61 = 1000000L / 61; val c62 = 1000000L / 62; val c63 = 1000000L / 63
    assert(out("b") == ((c62 + c61, 2L, 1L)), "item in both lists fuses both ranks")
    assert(out("a") == ((c61, 1L, 2L)))
    assert(out("d") == ((c62, 1L, 3L)))
    assert(out("c") == ((c63, 1L, 4L)))
  }

  test("E58: SNM pairs sort neighbors incl. across the block seam, verified") {
    import spark.implicits._
    // keys: 1,2 → "a b" (shuffled dup); 3 → "a b c" (own block under
    // prefix 8, reachable only through the seam join); 4 → "y z" (far)
    val docs = Seq((1L, "b a"), (2L, "a b"), (3L, "a b c"), (4L, "z z y"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.sortedNeighborhood(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(out == Map(
      (1L, 2L) -> 1000000L,     // identical token sets
      (1L, 3L) -> 666666L,      // |{a,b}∩{a,b,c}| / |∪| = 2/3
      (2L, 3L) -> 666666L))     // (3,4) proposed by the seam, jac 0 → cut
  }

  test("E58: SNM output is deterministic under input partitioning") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 3 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborhood(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    val base = pairs(docs)
    assert(base.nonEmpty)
    assert(base == pairs(docs.repartition(17)))
    assert(base == pairs(docs.repartition(1, col("doc_id"))))
  }

  test("E58: the pair set is invariant to block granularity on covered data") {
    import spark.implicits._
    val docs = Seq((1L, "b a"), (2L, "a b"), (3L, "a b c"), (4L, "z z y"))
      .toDF("doc_id", "text")
    def pairSet(prefix: Int) = graft.ops.Dedup
      .sortedNeighborhood(docs, blockPrefix = prefix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    // one giant block (pure in-window SNM) ≡ fragmented blocks + seams
    assert(pairSet(1) == pairSet(8))
    assert(pairSet(100) == pairSet(8))
  }

  test("D87: grid-blocked neighbor join — boundary straddle, coincidence, exactly-once") {
    import spark.implicits._
    val r = 10L
    val pts = Seq(
      (1L, 5L, 5L),     // cell (0,0)
      (2L, 12L, 5L),    // cell (1,0) — 7 from id 1, straddles the cell seam
      (3L, 5L, 6L),     // same cell as 1, distance 1
      (4L, 5L, 5L),     // coincident with 1 (distance 0)
      (5L, 100L, 100L), // isolated
      (6L, 16L, 5L))    // 11 from id 1 (outside r), 4 from id 2 (inside)
      .toDF("id", "x", "y")
    val out = graft.ops.Spatial.pairsFromPoints(pts, r).collect()
      .map(ro => (ro.getLong(0), ro.getLong(1)) -> ro.getLong(2)).toMap
    assert(out == Map(
      (1L, 2L) -> 7L, (1L, 3L) -> 1L, (1L, 4L) -> 0L,
      (2L, 3L) -> 7L, (2L, 4L) -> 7L, (2L, 6L) -> 4L,
      (3L, 4L) -> 1L))
    // exactly-once even through the 9-cell explode: no duplicate keys
    val rows = graft.ops.Spatial.pairsFromPoints(pts, r).collect()
    assert(rows.length == rows.map(ro => (ro.getLong(0), ro.getLong(1))).distinct.length)
  }

  test("D79: concurrency sweep — closed intervals, overnight carry-in") {
    import spark.implicits._
    val day = 86400000000L
    // sA spans midnight; day 1's FIRST delta is sA's end, so its peak
    // must come from greatest(open, open-d) — the carried-in plateau
    val sess = Seq((0L, (1.2 * day).toLong), (day / 2, (0.6 * day).toLong),
      ((1.25 * day).toLong, (1.3 * day).toLong))
      .toDF("start_us", "end_us")
    val out = graft.ops.Sessionize.concurrencyCurve(sess).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((2L, 2L)), 1L -> ((1L, 1L))))
  }
}
