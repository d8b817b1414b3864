package graft

import org.apache.spark.sql.functions._

import graft.etl.DataQuality
import graft.ops.{Bm25, TextAnalysis}

/** Hand-computed expectations for the diagnostic / retrieval operators
  * added in r4's second leg: B12 skew profiler, E39 BM25, E40 charset
  * gate (D41's equi-depth histogram is pinned in ScaleSpec alongside the
  * other relational plans, and all four have DuckDB oracles). */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("skew profiler: exact discrete quantiles from the count-of-counts") {
    // keys: a×1, b×2, c×2, d×5 → n_keys 4, n_rows 10, counts {1:1,2:2,5:1}
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(5)("d")).toDF("k")
    val m = DataQuality.skewProfile(df, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_keys") == 4 && m("n_rows") == 10)
    assert(m("max_cnt") == 5 && m("min_cnt") == 1)
    // p50: ⌈4/2⌉=2 → smallest cnt with cum≥2 is 2 (cum: 1→1, 2→3, 5→4)
    assert(m("p50_cnt") == 2)
    // p90: ⌈3.6⌉=4 → 5; p99: ⌈3.96⌉=4 → 5
    assert(m("p90_cnt") == 5 && m("p99_cnt") == 5)
    assert(m("mean_cnt_ppm") == 2500000L)   // 10/4 keys
    assert(m("skew_ppm") == 2000000L)       // max/mean = 2
  }

  test("bm25: an exact content twin is the top hit; shared-prefix doc is df-capped out") {
    // doc 0 = query (qMod 100). doc 1 is an exact twin: bigrams
    // "x y","y z","z w" — "x y" also in doc 2 → df 3 > 0.4·5, dropped;
    // the twin still matches on the surviving two. doc 2 shares ONLY
    // the dropped bigram with the query → must not be scored at all.
    val docs = Seq(
      (0L, "x y z w"), (1L, "x y z w"), (2L, "x y q r"),
      (3L, "m n o p"), (4L, "m n o q")).toDF("doc_id", "text")
    val hits = Bm25.topK(docs, qMod = 100, k = 5, dfFrac = 0.4).collect()
    assert(hits.map(_.getLong(0)).forall(_ == 0L))
    assert(hits.map(_.getLong(1)).toSeq == Seq(1L))
    assert(hits.head.getLong(2) > 0L && hits.head.getLong(3) == 1L)
  }

  test("charset gate: injected noise classes are counted exactly") {
    val docs = Seq(
      (1L, "clean ascii"), (7L, "oops"), (11L, "x"), (13L, "y"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.charsetGate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: untouched → keep
    assert(m(1L).getLong(2) == 0 && m(1L).getLong(3) == 0 &&
      m(1L).getLong(4) == 0 && m(1L).getLong(5) == 1)
    // doc 7: +U+FFFD → 1 replacement char (also non-ascii), keep 0
    assert(m(7L).getLong(1) == 5 && m(7L).getLong(2) == 1 &&
      m(7L).getLong(5) == 0)
    // doc 11: +" café naïve" → 2 non-ascii chars of 12 → 166666 ppm
    assert(m(11L).getLong(1) == 12 && m(11L).getLong(4) == 166666L &&
      m(11L).getLong(5) == 0)
    // doc 13: +2 tab control chars
    assert(m(13L).getLong(1) == 3 && m(13L).getLong(3) == 2 &&
      m(13L).getLong(5) == 0)
  }

  test("topk_min_l equals the window top-k on real events, across partial merges") {
    import graft.sources.Tables
    // repartition(16) on 4 cores forces multiple partial buffers per
    // group → update, serialize, and merge paths all exercised
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        graft.functions.GraftFunctions.cents(col("value")).as("v"))
      .repartition(16)
    val native = ev.groupBy(col("event_type"))
      .agg(graft.functions.TopKMinL(col("v"), 5).as("tk"))
      .select(col("event_type"), explode(col("tk")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("v"))
    val composed = ev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select(col("event_type"), col("v"))
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
    // sub-k group keeps multiset semantics (duplicates retained)
    val tiny = Seq(("a", 3L), ("a", 1L), ("a", 1L)).toDF("g", "v")
      .groupBy(col("g")).agg(graft.functions.TopKMinL(col("v"), 5).as("tk"))
      .collect()
    assert(tiny.head.getSeq[Long](1) == Seq(1L, 1L, 3L))
  }

  test("table diff prunes identical buckets and flags the changed one") {
    import graft.etl.TableDiff
    val a = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "payload")
    // one update (k=37), one delete (k=74): exactly two buckets differ
    val b = a.filter(col("k") =!= 74)
      .withColumn("payload",
        when(col("k") === 37, lit("CHANGED")).otherwise(col("payload")))
    val d = TableDiff.diff(a, b, "k", Seq("payload"), buckets = 10).collect()
    assert(d.map(_.getLong(0)).toSeq == Seq(4L, 7L))
    val byBucket = d.map(r => r.getLong(0) -> r).toMap
    // bucket 7 (k=37): same count, different checksum
    assert(byBucket(7L).getLong(1) == byBucket(7L).getLong(2) &&
      byBucket(7L).getLong(3) != byBucket(7L).getLong(4))
    // bucket 4 (k=74): count drop
    assert(byBucket(4L).getLong(1) == byBucket(4L).getLong(2) + 1)
  }

  test("prefix-filter jaccard join recalls every injected exact-dup pair at 1.0") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val out = graft.ops.PrefixJoin.jaccardJoin(docs).collect()
    val injected = docs.filter(col("doc_id") % 250 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    injected.foreach { id =>
      val hit = out.find(r => r.getLong(0) == id && r.getLong(1) == id + 10000000L)
      assert(hit.isDefined && hit.get.getDouble(3) == 1.0,
        s"exact-dup pair for $id missing or below 1.0")
    }
  }

  test("prefix join fail-fast budget aborts on a high-collision corpus") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    // sf0.001 documents already produce >0 candidate pairs, so a budget
    // of 0 must trip the pre-probe before any candidate join runs
    val ex = intercept[IllegalStateException] {
      graft.ops.PrefixJoin.jaccardJoin(docs, maxCandidates = 0L)
    }
    assert(ex.getMessage.contains("E41") &&
      ex.getMessage.contains("minhashLsh") &&
      ex.getMessage.contains("maxCandidates"),
      s"abort message must name the E3+E2 fallback: ${ex.getMessage}")
  }

  test("TopKMinL heap equals sorted-take-k on randomized multisets, incl. merges") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      val xs = Seq.fill(n)(rnd.nextLong() % 100)
      val h = new graft.functions.TopKMinL.MaxHeap(k)
      xs.foreach(h.offer)
      // split-and-merge must agree with the single-buffer fold
      val (a, b) = xs.splitAt(rnd.nextInt(n + 1))
      val h1 = new graft.functions.TopKMinL.MaxHeap(k)
      val h2 = new graft.functions.TopKMinL.MaxHeap(k)
      a.foreach(h1.offer)
      b.foreach(h2.offer)
      (0 until h2.size).foreach(i => h1.offer(h2.values(i)))
      val expect = xs.sorted.take(k)
      assert(h.sortedAsc.toSeq == expect, s"update path: n=$n k=$k")
      assert(h1.sortedAsc.toSeq == expect, s"merge path: n=$n k=$k")
    }
  }

  test("erasure accounting closes: surviving + erased = total, per type") {
    import graft.relational.RelationalQueries
    import graft.sources.Tables
    val out = RelationalQueries.erasure(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val totals = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == totals.keySet)
    out.foreach { case (t, (surv, erased)) =>
      assert(surv + erased == totals(t), s"$t: $surv + $erased != ${totals(t)}")
    }
    // and no erased user survives
    val survUsers = Tables.events(spark, sf)
      .filter(col("user_id") % 97 =!= 0).select("user_id")
    assert(survUsers.filter(col("user_id") % 97 === 0).count() == 0)
  }

  test("mode per group is the true argmax of the value histogram") {
    import graft.relational.RelationalQueries
    import graft.sources.Tables
    import graft.functions.GraftFunctions.cents
    val modes = RelationalQueries.modePerGroup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hist = Tables.events(spark, sf)
      .select(col("event_type"), cents(col("value")).as("v"))
      .groupBy("event_type", "v").count().collect()
      .groupBy(_.getString(0))
    hist.foreach { case (t, rows) =>
      val best = rows.map(r => (r.getLong(2), r.getLong(1)))
        .maxBy { case (n, v) => (n, -v) }
      assert(modes(t) == ((best._2, best._1)), s"$t: ${modes(t)} != $best")
    }
  }

  test("equi-depth histogram keeps tied values in one bucket") {
    import graft.relational.RelationalQueries
    // Direct-shape check on the real table: buckets are contiguous,
    // counts sum to the row count, and lo/hi ranges never overlap.
    val h = RelationalQueries.histogramDepth(spark, sf, nBuckets = 4).collect()
    assert(h.length <= 4 && h.map(_.getLong(1)).sum ==
      graft.sources.Tables.events(spark, sf).count())
    h.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
  }

  test("B20: integrity audit counts orphan keys AND rows, skips NULL FKs") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(2L), Some(2L),
      Some(3L), None).toDF("fk_col")
    val parent = Seq(1L, 3L, 9L).toDF("pk_col")
    val r = DataQuality.integrityAudit(Seq(
      ("child.parent", child, "fk_col", parent, "pk_col"))).collect().head
    assert(r.getString(0) == "child.parent")
    assert(r.getLong(1) == 3L, "NULL is not a key-domain member")
    assert(r.getLong(2) == 1L, "key 2 dangles")
    assert(r.getLong(3) == 3L, "three rows reference the dangling key")
  }

  test("B24: inferred members mint one placeholder per orphan key with " +
      "its pending blast radius; NULL and covered keys excluded") {
    val facts = Seq((Some(1L), 10L), (Some(2L), 20L), (Some(2L), 5L),
      (Some(9L), 7L), (None, 99L)).toDF("fk", "ts")
    val dim = Seq(1L, 3L).toDF("pk")
    val out = graft.etl.DataQuality
      .inferredMembers(facts, "fk", dim, "pk", "ts").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out == Map(
      2L -> ((2L, 5L, 20L, 1L)),   // two pending facts, span [5, 20]
      9L -> ((1L, 7L, 7L, 1L))))
  }

  test("B21: delta-join algebra equals the full recompute on random splits") {
    import graft.etl.IncrementalJoin
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 to 3) {
      val as = Seq.fill(40)((rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      val bs = Seq.fill(25)((rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      // trial 0 pins the empty-ΔA edge; later trials split randomly
      val (aOld, dA) =
        if (trial == 0) (as, Seq.empty) else as.partition(_ => rnd.nextBoolean())
      val (bOld, dB) = bs.partition(_ => rnd.nextBoolean())
      def a(x: Seq[(Long, Long)]) = x.toDF("k", "va")
      def b(x: Seq[(Long, Long)]) = x.toDF("k", "vb")
      val full = a(as).join(b(bs), Seq("k"))
      val inc = IncrementalJoin.maintain(
        a(aOld).join(b(bOld), Seq("k")),
        a(aOld), a(dA), b(bOld), b(dB), Seq("k"))
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"trial $trial: incremental view diverged from full recompute")
    }
  }

  test("B22: dictionary ids are a pure function of the value SET; encode round-trips") {
    import graft.etl.Dictionary
    val a = Seq("pear", "apple", "pear", "fig").toDF("fruit")
    val b = Seq("fig", "pear", "apple", "apple", "apple").toDF("fruit")
    // different multiplicities and row orders, same value set → same dict
    val da = Dictionary.build(a, "fruit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val db = Dictionary.build(b, "fruit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(da == db && da == Map("apple" -> 0L, "fig" -> 1L, "pear" -> 2L))
    // encode → decode returns the original values; NULL stays NULL
    val withNull = Seq(Some("fig"), None, Some("apple")).toDF("fruit")
    val dict = Dictionary.build(withNull, "fruit")
    val enc = Dictionary.encode(withNull, "fruit", dict)
    val back = enc.join(dict.select(col("id").as("fruit_id"),
        col("value")), Seq("fruit_id"), "left")
      .select(col("value")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getString(0))).toSet
    assert(back == Set(Some("fig"), Some("apple"), None))
    assert(enc.filter(col("fruit_id").isNull).count() == 1L)
  }

  test("D56: blocked interval overlap equals the quadratic count, pairs once") {
    import graft.ops.IntervalJoin
    // W=3 forces multi-bucket spans: shared buckets must not double-count
    val itv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 20L, 25L),
      (1L, 4L, 9L, 30L), (1L, 5L, 30L, 40L),
      (2L, 9L, 0L, 100L)) // other key: alone → no pairs, no output row
      .toDF("key", "id", "lo", "hi")
    val out = IntervalJoin.overlapCounts(itv, bucketW = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pairs for key 1: A-B, A-D, B-D, C-D, D-E (inclusive endpoints)
    assert(out == Map(1L -> 5L))

    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 3) {
      val rows = Seq.fill(60) {
        val lo = rnd.nextInt(200).toLong
        (rnd.nextInt(3).toLong, rnd.nextLong(1000000L),
          lo, lo + rnd.nextInt(30))
      }
      val naive = rows.groupBy(_._1).view.mapValues { g =>
        (for (a <- g; b <- g
              if a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4) yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val got = IntervalJoin.overlapCounts(
        rows.toDF("key", "id", "lo", "hi"), bucketW = 7L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"rows=$rows")
    }
  }

  test("B20: clean edge reports zero damage without dropping the row") {
    val child = Seq(1L, 1L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val r = DataQuality.integrityAudit(Seq(("a.b", child, "k", parent, "k")))
      .collect()
    assert(r.length == 1 &&
      r.head.getLong(1) == 2L && r.head.getLong(2) == 0L &&
      r.head.getLong(3) == 0L)
  }

  test("B25: money reconciliation — matched, delta octave, both orphans") {
    import spark.implicits._
    // order 1: head 100.00, items sum to exactly 100.00 (no disc/tax)
    // order 2: head 50.00, items 49.99 -> delta +0.01 = 100 cpp? no:
    //   head_cpp = 5000*10000 = 5e7; items = 4999*100*100 = 4.999e7;
    //   delta = 10000 cpp -> bits = 14 (2^13=8192 <= 10000 < 16384)
    // order 3: head only (orphan_order); item 9: detail only
    val orders = Seq((1L, 100.0), (2L, 50.0), (3L, 7.0))
      .toDF("o_orderkey", "o_totalprice")
    val items = Seq((1L, 100.0, 0.0, 0.0), (2L, 49.99, 0.0, 0.0),
      (9L, 5.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = graft.etl.DataQuality.reconcileMoney(orders, items)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("matched", 0L)) == ((1L, 0L, 0L)))
    assert(out(("delta", 14L)) == ((1L, 10000L, 10000L)))
    assert(out(("orphan_order", 0L))._1 == 1L)
    assert(out(("orphan_item", 0L))._1 == 1L)
    assert(out.size == 4)
  }

  test("H21: slice AUC matches per-slice H4; single-class slice pinned") {
    import spark.implicits._
    val scored = Seq(
      ("a", 3L, 1L), ("a", 2L, 0L), ("a", 1L, 1L),   // mixed slice
      ("b", 9L, 1L), ("b", 8L, 1L))                  // single-class
      .toDF("slice", "score", "label")
    val out = graft.ml.Evaluation.sliceAuc(scored).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val aOnly = scored.filter($"slice" === "a").select("score", "label")
    val h4 = graft.ml.Evaluation.aucExact(aOnly).collect().head
    assert(out("a") == ((h4.getLong(0), h4.getLong(1), h4.getLong(2))))
    assert(out("b") == ((2L, 0L, 500000L)))
  }
}
