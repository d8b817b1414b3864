package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sketches, TextAnalysis}
import graft.sources.Tables

/** D51 count-min semantics and E46 hashed-scoring algebra, pinned
  * against exact recomputation (the oracle twins prove cross-engine
  * agreement; these pin the SKETCH GUARANTEES). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS: estimates never undercount, and no true heavy hitter is missed") {
    val docs = Tables.documents(spark, sf)
    val est = Sketches.countMinHeavyHitters(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = truth.values.sum
    // One-sided error: est ≥ true for every reported hitter.
    est.foreach { case (tok, e) =>
      assert(e >= truth(tok), s"CMS undercounted $tok: $e < ${truth(tok)}")
    }
    // Overestimation can only ADD hitters, never drop one → zero false
    // negatives by construction.
    val trueHitters = truth.filter { case (_, c) => c * 200 >= total }.keySet
    assert(trueHitters.subsetOf(est.keySet),
      s"missed true heavy hitters: ${trueHitters -- est.keySet}")
  }

  test("CMS: width large enough to kill collisions makes estimates exact") {
    val docs = Seq("a a a b", "b c").toDF("text").withColumn("doc_id", lit(1L))
    val r = Sketches.countMinHeavyHitters(docs, width = 1 << 20, phiDen = 100)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("hashed score: bag semantics — token order never changes the margin") {
    val docs = Seq((1L, "alpha beta gamma beta"), (2L, "beta gamma beta alpha"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.hashedLinearScore(docs)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(r.size == 1, s"permuted bags scored differently: $r")
  }

  test("KMV: below k distinct values the estimate is exact") {
    val pairs = (1L to 10L).map(i => ("g", i)).toDF("grp", "v")
    val r = Sketches.kmvDistinct(pairs, "grp", "v", k = 64).collect()
    assert(r.length == 1 && r.head.getLong(1) == 10L)
  }

  test("KMV: k=64 estimate lands within 2x of the true distinct count") {
    val pairs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        col("o_custkey").as("c_custkey")), Seq("c_custkey"))
      .join(Tables.lineitem(spark, sf).select(
        col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        Seq("o_orderkey"))
    val est = Sketches.kmvDistinct(pairs, "c_nationkey", "l_partkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val exact = pairs.groupBy(col("c_nationkey"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (g, d) =>
      assert(est(g) * 2 >= d && est(g) <= d * 2,
        s"nation $g: est ${est(g)} vs exact $d out of 2x band")
    }
  }

  test("KMV set algebra: identical sides give inter == union, jaccard 1.0") {
    val vals = (1L to 40L).flatMap(i => Seq((0L, i), (1L, i)))
      .toDF("side", "v")
    val r = Sketches.kmvSetOps(vals, k = 64).collect().head
    // below k everything is exact: 40 distinct per side and in union
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L)
    assert(r.getLong(2) == 40L && r.getLong(3) == 40L)
    assert(r.getLong(4) == 1000000L)
  }

  test("KMV set algebra: disjoint sides give inter 0, union = |A|+|B|") {
    val vals = ((1L to 20L).map((0L, _)) ++ (101L to 130L).map((1L, _)))
      .toDF("side", "v")
    val r = Sketches.kmvSetOps(vals, k = 64).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 30L)
    assert(r.getLong(2) == 50L && r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("KMV set algebra: real two-year part sets land within 2x of truth") {
    val li = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")).isin(1995, 2001))
      .select(when(year(col("l_shipdate")) === 1995, 0L).otherwise(1L)
        .as("side"), col("l_partkey").as("v"))
    val r = Sketches.kmvSetOps(li).collect().head
    val sets = li.collect().map(x => x.getLong(0) -> x.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (ta, tb) = (sets(0L), sets(1L))
    def within2x(est: Long, t: Long) = est * 2 >= t && est <= t * 2
    assert(within2x(r.getLong(0), ta.size.toLong))
    assert(within2x(r.getLong(1), tb.size.toLong))
    assert(within2x(r.getLong(2), (ta ++ tb).size.toLong))
    assert(within2x(r.getLong(3), (ta & tb).size.toLong))
  }

  test("inverted index: capped postings are the sorted doc set; over-cap keep stats only") {
    val docs = Tables.documents(spark, sf)
    val rows = graft.ops.TextAnalysis.invertedIndex(docs).collect()
    val nDocs = docs.count()
    assert(rows.nonEmpty)
    // postings serialize to a comma-joined string (QueryContractSpec:
    // query outputs stay atomic)
    def post(r: org.apache.spark.sql.Row): Seq[Long] = {
      val s = r.getString(3)
      if (s.isEmpty) Seq.empty else s.split(",").toSeq.map(_.toLong)
    }
    rows.foreach { r =>
      val (df, cf) = (r.getLong(1), r.getLong(2))
      val p = post(r)
      assert(cf >= df && df >= 1)
      if (df * 1000000L <= 780000L * nDocs) {
        assert(p.length == df, s"term ${r.getString(0)}: |postings| != df")
        assert(p == p.sorted && p.distinct == p)
      } else assert(p.isEmpty, s"over-cap term ${r.getString(0)} collected")
    }
    // the generator's rare term gets a posting list; common terms don't
    assert(rows.exists(post(_).nonEmpty))
    assert(rows.exists(post(_).isEmpty))
  }

  test("hashed score: margin is linear in token multiplicity") {
    val docs = Seq((1L, "tok"), (2L, "tok tok tok")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashedLinearScore(docs)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(rows(1L)._1 == 1L && rows(2L)._1 == 3L)
    assert(rows(2L)._2 == 3L * rows(1L)._2)
  }

  test("bitset distinct equals countDistinct exactly, duplicates collapse to bits") {
    val rnd = new scala.util.Random(31L)
    val rows = Seq.fill(3000)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
    val df = rows.toDF("g", "id")
    val got = Sketches.bitsetDistinct(df.union(df), "g", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(got == want)
  }

  test("HLL: multiplicity-blind — duplicating every row leaves the estimate fixed") {
    val base = (1L to 3000L).map(i => (i % 3, i)).toDF("g", "v")
    val once = Sketches.hllDistinct(base, "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val thrice = Sketches.hllDistinct(base.union(base).union(base), "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == thrice, "register max is idempotent — duplicates must not move it")
  }

  test("qsketch: bucket ids match the reference map exhaustively over 1..4096") {
    // covers the exact range (c < 64), every octave boundary up to 2^12,
    // and the monotone/contiguous contract the rank walk depends on
    def refBid(c: Long): Long =
      if (c < 64) c
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
        (e - 6).toLong * 64 + (c >> (e - 6))
      }
    val df = (1L to 4096L).map(v => (v, v)).toDF("g", "v")
    val got = graft.ops.QuantileSketch.buildSketch(df, "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 4096L).foreach { v =>
      assert(got(v) == refBid(v), s"bid($v): got ${got(v)} want ${refBid(v)}")
    }
    assert((1L until 4096L).forall(v => refBid(v) <= refBid(v + 1) &&
      refBid(v + 1) - refBid(v) <= 1), "monotone and contiguous")
  }

  test("qsketch: per-shard partial sketches merge losslessly into the global sketch") {
    val df = (1L to 5000L).map(i =>
      ((i % 2).toString, i * 37 % 100000 + 1, i % 3)).toDF("g", "v", "shard")
    val parts = (0L until 3L).map(s => graft.ops.QuantileSketch
      .buildSketch(df.filter(col("shard") === s), "g", "v"))
    val merged = graft.ops.QuantileSketch.mergeSketches("g", parts)
    val global = graft.ops.QuantileSketch.buildSketch(df, "g", "v")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty,
      "bucket-wise count addition must equal the single-pass build")
  }

  test("qsketch: every estimate within the 2^-7 relative-error bound of the exact quantile") {
    val li = Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("flag"),
      graft.functions.GraftFunctions.cents(col("l_extendedprice")).as("c"))
    val est = graft.ops.QuantileSketch.groupQuantiles(li, "flag", "c")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    val vals = li.collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    est.foreach { case ((flag, qppm), e) =>
      val v = vals(flag)
      val n = v.length.toLong
      // the walk's rank: smallest r with r·10^6 ≥ n·q
      val rank = ((n * qppm + 999999L) / 1000000L).toInt
      val exact = v(rank - 1)
      assert(math.abs(e - exact) * 128 <= exact,
        s"$flag q=$qppm: est $e vs exact $exact breaks the bound")
    }
  }

  test("HLL: estimate lands inside the theoretical error band, v_zero empties out") {
    // m=64 → σ = 1.04/√64 ≈ 13%; a fixed hash makes the draw
    // deterministic, so a 2.5σ band is a stable assertion, not a flake
    for (n <- Seq(2000L, 20000L)) {
      val r = Sketches.hllDistinct((1L to n).map(i => (0L, i)).toDF("g", "v"),
        "g", "v").collect().head
      val est = r.getLong(1)
      assert(math.abs(est - n).toDouble / n < 0.33,
        s"HLL est $est too far from true $n")
      assert(r.getLong(2) == 0L, s"v_zero should be 0 at n=$n >> m")
    }
  }
}
