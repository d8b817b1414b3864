package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, MarketBasket, RankTests, TrainingData}
import graft.ml.Evaluation

/** Hand-computed pins for the round-9 rank/eval/curation operators —
  * the oracle gate proves cross-engine agreement; these pin the
  * STATISTICS to their textbook values on worked examples, plus the
  * degenerate-input contracts (all-tied, one-sided, single-participant)
  * the oracle's organic data may never exercise.
  */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  test("D92 Mann-Whitney: worked example with a tie, exact 2U and z") {
    // group1 = {1, 3}, group0 = {2, 4, 4}: ranks 1..5 with 4,4 sharing
    // avg rank 4.5; R1 = 1+3 = 4, U1 = 1, T = 2^3-2 = 6
    val df = Seq(
      ("s", 1L, 1L), ("s", 0L, 2L), ("s", 1L, 3L),
      ("s", 0L, 4L), ("s", 0L, 4L)).toDF("slice", "grp", "v")
    val r = RankTests.mannWhitney(df).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)       // n1, n2
    assert(r.getLong(3) == 2L)                             // 2*U1
    // z = (2U1 - n1*n2)/sqrt(n1*n2*(N^3-N-T)/(3N(N-1))) = -4/sqrt(11.4)
    assert(math.abs(r.getDouble(4) - (-4.0 / math.sqrt(684.0 / 60.0))) < 1e-12)
  }

  test("D92: one-sided slice pins z = 0 with counts visible") {
    val df = Seq(("s", 1L, 5L), ("s", 1L, 7L)).toDF("slice", "grp", "v")
    val r = RankTests.mannWhitney(df).collect().head
    assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
  }

  test("D93 Kruskal-Wallis: tie-free worked example H = 3 exactly") {
    // g1 = {1,2}, g2 = {3,4,5}: H = 12/30*(9/2 + 144/3) - 18 = 3
    val df = Seq(("s", "g1", 1L), ("s", "g1", 2L), ("s", "g2", 3L),
      ("s", "g2", 4L), ("s", "g2", 5L)).toDF("slice", "g", "v")
    val r = RankTests.kruskalWallis(df).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 5L)
    assert(r.getLong(3) == 3000000L && r.getLong(4) == 3000000L)
  }

  test("D93: quotients beyond int64 stay exact (the 10x-tier wrap regression)") {
    // 20k tie-free rows split into two maximally-separated groups: the
    // per-group term r2g²·3e6/ng ≈ 2.7e19 exceeds int64, which Spark's
    // `div` (IntegralDivide → BIGINT) silently wrapped negative before
    // the decimal floor-division fix — caught live by the 10× Zipf
    // tier, where the wrapped terms drove H < 0 and the 0-pin ate it.
    val df = spark.range(1, 20001).select(
      lit("s").as("slice"),
      when(col("id") <= 10000, "a").otherwise("b").as("g"),
      col("id").as("v"))
    val r = RankTests.kruskalWallis(df).collect().head
    def term(r2: BigInt, ng: BigInt) = r2 * r2 * 3000000 / ng
    val s3m = term(BigInt(100010000L), 10000) + term(BigInt(300010000L), 10000)
    val n = BigInt(20000)
    val h = s3m / (n * (n + 1)) - BigInt(3000000) * (n + 1)
    // the per-group quotient really does bite int64 in this fixture
    assert(term(BigInt(300010000L), 10000) > BigInt(Long.MaxValue))
    assert(r.getLong(3) == h.toLong && r.getLong(4) == h.toLong,
      s"got ${r.getLong(3)} want $h")
  }

  test("D93: all-tied slice pins both statistics to 0") {
    val df = Seq(("s", "g1", 7L), ("s", "g2", 7L), ("s", "g2", 7L))
      .toDF("slice", "g", "v")
    val r = RankTests.kruskalWallis(df).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("H27 Kendall W: perfect concordance 10^6, perfect reversal 0") {
    val same = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (1L, "b", 1L), (2L, "b", 2L), (3L, "b", 3L), (4L, "b", 4L))
      .toDF("item", "rater", "v")
    val w1 = RankTests.kendallW(same, m = 2).collect().head
    assert(w1.getLong(2) == 1000000L)
    // chi2 = m(n-1)W = 2*3*10^6
    assert(w1.getLong(3) == 6000000L)
    val rev = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (1L, "b", 4L), (2L, "b", 3L), (3L, "b", 2L), (4L, "b", 1L))
      .toDF("item", "rater", "v")
    assert(RankTests.kendallW(rev, m = 2).collect().head.getLong(2) == 0L)
  }

  test("H26 Cochran Q: k = 2 reduces to McNemar's (b-c)^2/(b+c)") {
    // A fires on {1,2,3}, B on {1}: b = 2, c = 0, Q = 4/2 = 2
    val rows = for {
      i <- 1L to 4L
      (r, x) <- Seq(("rA", if (i <= 3) 1L else 0L),
        ("rB", if (i == 1) 1L else 0L))
    } yield ("s", i, r, x)
    val r = Evaluation.cochranQ(rows.toDF("slice", "item", "rater", "x"))
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(5) == 2000L)
  }

  test("H28 Krippendorff: perfect agreement 10^6, maximal disagreement -0.5") {
    val agree = Seq((1L, "rA", "a"), (1L, "rB", "a"),
      (2L, "rA", "b"), (2L, "rB", "b"))
      .map { case (i, r, c) => ("s", i, r, c) }
      .toDF("slice", "item", "rater", "cat")
    assert(Evaluation.krippendorffAlpha(agree, maxRaters = 2)
      .collect().head.getLong(4) == 1000000L)
    val disagree = Seq((1L, "rA", "a"), (1L, "rB", "b"),
      (2L, "rA", "b"), (2L, "rB", "a"))
      .map { case (i, r, c) => ("s", i, r, c) }
      .toDF("slice", "item", "rater", "cat")
    assert(Evaluation.krippendorffAlpha(disagree, maxRaters = 2)
      .collect().head.getLong(4) == -500000L)
  }

  test("H28: units with one rating are unpairable and excluded") {
    val df = Seq(("s", 1L, "rA", "a"), ("s", 1L, "rB", "a"),
      ("s", 2L, "rA", "b")) // item 2: m_u = 1, must not poison alpha
      .toDF("slice", "item", "rater", "cat")
    val r = Evaluation.krippendorffAlpha(df, maxRaters = 2).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L)   // 1 unit, 2 ratings
    assert(r.getLong(4) == 1000000L)                   // one category left
  }

  test("D94 HHI: monopoly pins 10^6/10^6/1000; even 4-split is 250k/0/4000") {
    val df = Seq(("mono", 1L, 500L),
      ("even", 1L, 25L), ("even", 2L, 25L), ("even", 3L, 25L), ("even", 4L, 25L))
      .toDF("grp", "p", "amt_cents")
    val byGrp = graft.ops.Analytics.hhiProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byGrp("mono") == ((1000000L, 1000000L, 1000L)))
    assert(byGrp("even") == ((250000L, 0L, 4000L)))
  }

  test("D95 link prediction: wedge pairs found once, hubs cappable, jaccard exact") {
    // edges (support >= 2): (1,2), (2,3), (1,4); distance-2 candidates:
    // (1,3) via 2 and (2,4) via 1, both jaccard = 1/(2+1-1) = 0.5
    val li = Seq(
      (101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 2L), (103L, 3L), (104L, 2L), (104L, 3L),
      (105L, 1L), (105L, 4L), (106L, 1L), (106L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = MarketBasket.linkPredict(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 500000L), (2L, 4L, 1L, 500000L)))
  }

  test("H24: the pinned discount table IS floor(1e6/log2(r+1))") {
    val expected = (1 to 10).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    assert(Ann.NdcgW == expected)
  }

  test("E73: a near-dup pair never straddles splits; dup-free reduces to E23") {
    // two identical docs (ids 5, 6) under their own source: the LSH
    // cluster keys both by min id 5, so source 'dup' lands as ONE
    // cluster in ONE split
    val docs = Seq(
      (5L, "alpha beta gamma delta", "en", "dup", 22L),
      (6L, "alpha beta gamma delta", "en", "dup", 22L),
      (7L, "wholly unrelated text one", "en", "solo", 25L),
      (8L, "completely different words two", "en", "solo", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TrainingData.clusterSafeSplit(docs)
      .filter(col("source") === "dup").collect()
    assert(out.length == 1, out.mkString(","))
    assert(out.head.getLong(2) == 2L && out.head.getLong(3) == 1L)
  }
}
