package graft

import scala.util.Random

import graft.ml.Evaluation
import graft.ops.Sketches

/** Randomized (seeded) invariants for the estimator family — the
  * guarantees the oracle rows demonstrate at one input, checked across
  * many:
  *   1. rank-sum AUC == the naive pairwise win/tie count, any ties
  *   2. CMS never undercounts, and is exact at collision-free width
  *   3. KMV is exact below k and lands in the analytic error band
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260813L)

  test("AUC equals the pairwise count on random tied score sets") {
    for (_ <- 1 to 8) {
      val n = 20 + rnd.nextInt(30)
      val rows = Seq.fill(n)((rnd.nextInt(8).toLong, rnd.nextInt(2).toLong))
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      whenever(pos.nonEmpty && neg.nonEmpty) {
        val u2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        val expected = u2 * 500000L / (pos.size.toLong * neg.size)
        val got = Evaluation.aucExact(rows.toDF("score", "label"))
          .collect().head.getLong(2)
        assert(got == expected, s"rows=$rows")
      }
    }
  }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  test("CMS one-sided error holds on random zipf-ish multisets") {
    for (trial <- 1 to 3) {
      // skewed multiset: token t_i drawn with weight ~ 1/(i+1)
      val vocab = (0 until 40).map(i => s"t$trial-$i")
      val toks = Seq.fill(800) {
        val i = math.min((1.0 / (rnd.nextDouble() + 0.02)).toInt, 39)
        vocab(i)
      }
      val docs = toks.grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // phiDen huge → every token reported with its estimate
      val est = Sketches.countMinHeavyHitters(docs, phiDen = 1000000000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == truth.keySet)
      truth.foreach { case (t, c) =>
        assert(est(t) >= c, s"undercount $t: ${est(t)} < $c")
      }
      // collision-free width → exact
      val exact = Sketches.countMinHeavyHitters(docs, width = 1 << 21,
        phiDen = 1000000000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact == truth)
    }
  }

  test("KS equals the naive sup-difference on random tied samples") {
    for (_ <- 1 to 8) {
      val na = 5 + rnd.nextInt(40)
      val nb = 5 + rnd.nextInt(40)
      val a = Seq.fill(na)(rnd.nextInt(12).toLong)
      val b = Seq.fill(nb)(rnd.nextInt(12).toLong)
      val naive = (a ++ b).distinct.map { x =>
        math.abs(nb.toLong * a.count(_ <= x) - na.toLong * b.count(_ <= x))
      }.max
      val r = Evaluation.ksDrift(
        (a.map((0L, _)) ++ b.map((1L, _))).toDF("side", "v"))
        .collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
        ((na.toLong, nb.toLong, naive)), s"a=$a b=$b")
      assert(r.getLong(3) == naive * 1000000L / (na.toLong * nb))
    }
  }

  test("PR curve equals naive threshold sweep on random tied score sets") {
    for (_ <- 1 to 6) {
      val n = 15 + rnd.nextInt(40)
      val rows = Seq.fill(n)((rnd.nextInt(9).toLong, rnd.nextInt(2).toLong))
      val nPos = rows.count(_._2 == 1L).toLong
      whenever(nPos > 0) {
        val got = Evaluation.prCurve(rows.toDF("score", "label"))
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        val thresholds = rows.map(_._1).distinct
        assert(got.keySet == thresholds.toSet)
        thresholds.foreach { t =>
          val tp = rows.count(r => r._1 >= t && r._2 == 1L).toLong
          val pp = rows.count(_._1 >= t).toLong
          assert(got(t) == ((tp, pp - tp, tp * 1000000L / pp,
            tp * 1000000L / nPos)), s"t=$t rows=$rows")
        }
      }
    }
  }

  test("KMV is exact below k and inside the analytic band above it") {
    for (trial <- 1 to 4) {
      val d = 30 + rnd.nextInt(3000)
      val vals = rnd.shuffle((1L to 10000L).toList).take(d)
        .map(v => ("g", v * 7919L + trial))
      val est = Sketches.kmvDistinct(vals.toDF("grp", "v"), "grp", "v")
        .collect().head.getLong(1)
      if (d < 64) assert(est == d.toLong, s"below-k trial: $est != $d")
      else {
        // σ ≈ d/√(k−2); allow 6σ — deterministic given the seed anyway
        val sigma = d / math.sqrt(62.0)
        assert(math.abs(est - d) <= 6 * sigma, s"d=$d est=$est")
      }
    }
  }
}
