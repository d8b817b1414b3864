package graft

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator

import graft.ml.FraudScorer
import graft.sources.Tables

/** H1 — MLlib fraud scorer end to end on the sf0.001 tables. */
class MlSpec extends SparkSpec {

  test("H3: fitted pipeline round-trips through save/load with identical scores") {
    import graft.ml.FraudScorer
    val tf = FraudScorer.trainingFrame(spark, sf).cache()
    val model = FraudScorer.pipeline().fit(tf)
    val dir = java.nio.file.Files.createTempDirectory("graft_model")
      .resolve("m").toString
    model.write.overwrite().save(dir)
    val back = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(tf).select("user_id", "prediction")
    val b = back.transform(tf).select("user_id", "prediction")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("scorer trains and separates rule-flagged users") {
    val tf = FraudScorer.trainingFrame(spark, sf)
    assert(tf.count() > 0)
    assert(tf.filter("label = 1.0").count() > 0)

    val model = FraudScorer.pipeline().fit(tf)
    val scored = model.transform(tf)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .evaluate(scored)
    assert(auc >= 0.5 && auc <= 1.0)
    assert(scored.select("prediction").distinct().count() >= 1)
  }

  test("H4-H8 evaluate the H1 LR fraud scorer end to end") {
    import org.apache.spark.ml.functions.vector_to_array
    import org.apache.spark.sql.functions._
    val tf = FraudScorer.trainingFrame(spark, sf).cache()
    val model = FraudScorer.pipeline().fit(tf)
    // learned P(fraud) quantized to exact integer nano-units — the same
    // integer-score contract the H metrics hold for the E46 scorer and
    // the q_fraud_auc deterministic scorer
    val scored = model.transform(tf)
      .select(
        (vector_to_array(col("probability")).getItem(1) * 1e9)
          .cast("long").as("score"),
        col("label").cast("long").as("label"))
      .cache()
    val n = scored.count()
    val aucRow = graft.ml.Evaluation.aucExact(scored).collect().head
    val (nPos, aucPpm) = (aucRow.getLong(0), aucRow.getLong(2))
    // trained on its own features it must do at least as well as chance
    assert(aucPpm >= 500000L && aucPpm <= 1000000L, s"auc_ppm=$aucPpm")
    // H7: the lowest threshold recalls everything
    val pr = graft.ml.Evaluation.prCurve(scored).collect()
    assert(pr.head.getLong(1) == nPos && pr.head.getLong(4) == 1000000L)
    // H8: the best-F1 point dominates every swept operating point
    val bf = graft.ml.Evaluation.bestF1(scored).collect().head.getLong(4)
    val swept = pr.map { r =>
      val (tp, fp) = (r.getLong(1), r.getLong(2))
      2L * tp * 1000000000000L / (tp + fp + nPos)
    }
    assert(swept.max == bf, s"bestF1=$bf sweep max=${swept.max}")
    // H5: the reliability bins close the accounting
    val cal = graft.ml.Evaluation.calibration(scored).collect()
    assert(cal.map(_.getLong(1)).sum == n)
    assert(cal.map(_.getLong(2)).sum == nPos)
    // H6: score drift between classes is a valid statistic, and a
    // better-than-chance scorer separates the class distributions
    val ks = graft.ml.Evaluation.ksDrift(
      scored.select(col("label").as("side"), col("score").as("v")))
      .collect().head.getLong(3)
    assert(ks >= 0L && ks <= 1000000L)
    if (aucPpm > 600000L) assert(ks > 0L)
  }

  private def auc(rows: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    graft.ml.Evaluation.aucExact(rows.toDF("score", "label"))
      .collect().head.getLong(2)
  }

  test("H4: AUC is 1.0 for perfect separation, 0 for inverted, 0.5 for constant") {
    assert(auc(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))) == 1000000L)
    assert(auc(Seq((10L, 0L), (9L, 0L), (2L, 1L), (1L, 1L))) == 0L)
    assert(auc(Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L))) == 500000L)
  }

  test("H4: rank-sum AUC equals the naive pairwise count with ties") {
    val rows = Seq((3L, 1L), (3L, 0L), (7L, 1L), (1L, 0L), (7L, 0L),
      (2L, 1L), (9L, 0L), (3L, 1L), (2L, 0L), (8L, 1L))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    // pairwise: win = 2, tie = 1, in half-units
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = u2 * 500000L / (pos.size.toLong * neg.size)
    assert(auc(rows) == expected)
  }

  test("H5: calibration bins close the accounting and bound the rate") {
    import spark.implicits._
    val rows = Seq((-700L, 0L), (-700L, 1L), (-200L, 0L), (0L, 1L),
      (499L, 1L), (500L, 0L), (1200L, 1L))
    val out = graft.ml.Evaluation.calibration(rows.toDF("score", "label"))
      .collect()
    assert(out.map(_.getLong(1)).sum == rows.size.toLong)
    assert(out.map(_.getLong(2)).sum == rows.map(_._2).sum)
    out.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      // bin edges: [bin, bin+500) — the -700s land together in [-1000,-500)
    }
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(-1000L) == 2L && m(-500L) == 1L && m(0L) == 2L && m(500L) == 1L
      && m(1000L) == 1L)
  }

  test("H6: KS is 0 on identical samples, 10^6 on separated ones, exact on a hand case") {
    import spark.implicits._
    def ks(rows: Seq[(Long, Long)]): (Long, Long) = {
      val r = graft.ml.Evaluation.ksDrift(rows.toDF("side", "v"))
        .collect().head
      (r.getLong(2), r.getLong(3))
    }
    val same = (1L to 50L).flatMap(v => Seq((0L, v), (1L, v)))
    assert(ks(same) == ((0L, 0L)))
    val apart = (1L to 10L).map((0L, _)) ++ (11L to 20L).map((1L, _))
    assert(ks(apart)._2 == 1000000L)
    // A={1,2,3}, B={2,4}: sup|F_A−F_B| at x=3 is |1 − 1/2| → 3/6
    val hand = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 4L))
    assert(ks(hand) == ((3L, 500000L)))
  }

  test("H7: PR curve — exact points on a hand case, accounting closes at the tail") {
    import spark.implicits._
    // scores desc: 9(+), 7(−), 5(+), 5(+), 3(−)
    val rows = Seq((9L, 1L), (7L, 0L), (5L, 1L), (5L, 1L), (3L, 0L))
    val out = graft.ml.Evaluation.prCurve(rows.toDF("score", "label"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 4, "one operating point per DISTINCT score")
    assert(out(9L) == ((1L, 0L, 1000000L, 333333L)))
    assert(out(7L) == ((1L, 1L, 500000L, 333333L)))
    assert(out(5L) == ((3L, 1L, 750000L, 1000000L)))    // tie group fused
    assert(out(3L) == ((3L, 2L, 600000L, 1000000L)))    // tail: tp=n_pos
    // monotone recall as the threshold drops
    val byThresh = out.toSeq.sortBy(-_._1).map(_._2._4)
    assert(byThresh == byThresh.sorted)
  }

  test("H10: replicate-0 bootstrap AUC equals the naive weighted pairwise count") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Md5Prefix32
    // deterministic Poisson(1) weight replay — same thresholds as the op
    def wgt(r: Int, id: Long): Long = {
      val u = Md5Prefix32.hash(UTF8String.fromString(s"boot:$r:$id"))
      if (u < 1580030168L) 0L else if (u < 3160060337L) 1L
      else if (u < 3950075421L) 2L else if (u < 4213413783L) 3L
      else if (u < 4279248373L) 4L else if (u < 4292415291L) 5L else 6L
    }
    val rows = (1L to 40L).map(i => (i, (i * 7) % 13, if (i % 3 == 0) 1L else 0L))
    val df = rows.toDF("doc_id", "score", "label")
    val got = graft.ml.Evaluation.aucBootstrap(df, b = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (r <- 0 until 4) {
      val w = rows.map { case (id, s, lab) => (s, lab, wgt(r, id)) }
      val pos = w.filter(_._2 == 1L); val neg = w.filter(_._2 == 0L)
      val wp = pos.map(_._3).sum; val wn = neg.map(_._3).sum
      val u2 = (for (p <- pos; n <- neg) yield {
        if (p._1 > n._1) 2L * p._3 * n._3
        else if (p._1 == n._1) p._3 * n._3 else 0L
      }).sum
      assert(got(r.toLong) == ((wp, wn, u2 * 500000L / (wp * wn))),
        s"replicate $r")
    }
  }

  test("H10: bootstrap band brackets the point AUC on the real scorer frame") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val scored = graft.ops.TextAnalysis.hashedLinearScore(docs)
      .select(col("doc_id"), col("margin"))
      .join(docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_en")), Seq("doc_id"))
    val point = graft.ml.Evaluation
      .aucExact(scored, score = "margin", label = "is_en")
      .head().getAs[Long]("auc_ppm")
    val reps = graft.ml.Evaluation
      .aucBootstrap(scored, score = "margin", label = "is_en")
      .select("auc_ppm").collect().map(_.getLong(0))
    assert(reps.length == 16)
    assert(reps.min <= point && point <= reps.max,
      s"point $point outside [${reps.min}, ${reps.max}]")
  }

  test("H8: best-F1 point matches the hand-computed sweep") {
    import spark.implicits._
    // thresholds: 9 → F1 2/4; 7 → 2/5; 5 → 6/7 (best); 3 → 6/8
    val rows = Seq((9L, 1L), (7L, 0L), (5L, 1L), (5L, 1L), (3L, 0L))
    val r = graft.ml.Evaluation.bestF1(rows.toDF("score", "label"))
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 5L && row.getLong(1) == 3L &&
      row.getLong(2) == 1L && row.getLong(3) == 0L)
    assert(row.getLong(4) == 2L * 3L * 1000000000000L / 7L)
  }

  test("H11: lift table buckets on the distinct-score contraction, ties shared") {
    import spark.implicits._
    // 8 rows, 4 positives, 4 buckets. Distinct scores DESC:
    //   30: n=2 np=1 cum_lt=0 → bucket 1
    //   20: n=2 np=2 cum_lt=2 → 4*2 div 8 = 1 → bucket 2
    //   10: n=4 np=1 cum_lt=4 → bucket 3 (bucket 4 stays empty: ties
    //       share a bucket, sizes are only N/k when no straddle)
    val rows = Seq((30L, 1L), (30L, 0L), (20L, 1L), (20L, 1L),
      (10L, 1L), (10L, 0L), (10L, 0L), (10L, 0L))
    val out = graft.ml.Evaluation
      .liftTable(rows.toDF("score", "label"), buckets = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // (n, n_pos, cum_n, cum_pos, gain_ppm, lift_ppm)
    assert(out(1L) == (2L, 1L, 2L, 1L, 250000L, 1000000L))
    assert(out(2L) == (2L, 2L, 4L, 3L, 750000L, 1500000L))
    assert(out(3L) == (4L, 1L, 8L, 4L, 1000000L, 1000000L))
  }

  test("H11: cost threshold minimizes money, not F1") {
    import spark.implicits._
    // t=3: fn 1 → 10c; t=2: +fp → 11c; t=1: fp 1 → 1c (min); none: 20c
    val scored = Seq((3L, 1L), (2L, 0L), (1L, 1L)).toDF("score", "label")
    val r = graft.ml.Evaluation
      .costThreshold(scored, fpCostCents = 1L, fnCostCents = 10L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (1L, 2L, 1L, 0L, 1L))
  }

  test("H11: flag-nothing wins when every flag is a false positive") {
    import spark.implicits._
    val scored = Seq((2L, 0L), (1L, 0L)).toDF("score", "label")
    val r = graft.ml.Evaluation
      .costThreshold(scored, fpCostCents = 100L, fnCostCents = 900L)
      .collect().head
    assert((r.getLong(0), r.getLong(2), r.getLong(4)) == (3L, 0L, 0L),
      "the max(s)+1 sentinel must be electable and chosen")
  }

  test("H15: average precision — exact hand case, perfect ranking 1.0") {
    import spark.implicits._
    val mixed = Seq((3L, 1L), (2L, 0L), (1L, 1L)).toDF("score", "label")
    val r = graft.ml.Evaluation.averagePrecision(mixed).collect().head
    // levels desc: prec 1e6, 500000, 666666; AP = (1e6 + 666666) div 2
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 1L, 833333L, 666666L))
    val perfect = Seq((3L, 1L), (2L, 1L), (1L, 0L)).toDF("score", "label")
    assert(graft.ml.Evaluation.averagePrecision(perfect)
      .collect().head.getLong(2) == 1000000L)
  }

  test("H14: McNemar judges on discordant cells only; never-disagree is 0") {
    import spark.implicits._
    val paired = Seq((1L, 1L, 1L), (1L, 0L, 1L), (0L, 1L, 1L),
      (0L, 0L, 1L), (1L, 1L, 0L), (1L, 0L, 1L))
      .toDF("pred_a", "pred_b", "label")
    val r = graft.ml.Evaluation.mcnemar(paired).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (6L, 3L, 2L))
    assert((r.getLong(3), r.getLong(4)) == (500000L, 333333L))
    assert((r.getLong(5), r.getLong(6)) == (2L, 1L))
    assert(math.abs(r.getDouble(7) - 1.0 / 3.0) < 1e-15)
    val agree = Seq((1L, 1L, 0L), (0L, 0L, 1L)).toDF("pred_a", "pred_b", "label")
    assert(graft.ml.Evaluation.mcnemar(agree).collect().head.getDouble(7) == 0.0)
  }

  test("H13: Kendall tau-b — perfect concordance 1.0, ties corrected") {
    import spark.implicits._
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("va", "vb")
    val p = graft.ml.Evaluation.kendallTauB(perfect).collect().head
    assert((p.getLong(1), p.getLong(2), p.getLong(4), p.getLong(5)) ==
      (3L, 0L, 0L, 0L))
    assert(p.getDouble(6) == 1.0)
    // one tie in va: C=2, D=0, n0=3, ties_a=1 -> tau = 2/sqrt(2*3)
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("va", "vb")
    val t = graft.ml.Evaluation.kendallTauB(tied).collect().head
    assert((t.getLong(1), t.getLong(2), t.getLong(3), t.getLong(4)) ==
      (2L, 0L, 3L, 1L))
    assert(math.abs(t.getDouble(6) - 2.0 / math.sqrt(6.0)) < 1e-15)
    // degenerate marginal (all vb equal): tau pinned to 0, not NULL
    val degen = Seq((1L, 9L), (2L, 9L)).toDF("va", "vb")
    assert(graft.ml.Evaluation.kendallTauB(degen)
      .collect().head.getDouble(6) == 0.0)
  }

  test("H23: gamma/Somers' D — hand counts, and D_a|b ≡ 2·AUC−1 on a binary outcome") {
    import spark.implicits._
    // scores: neg {1,2}, pos {2,3} — one score tie across labels.
    // Cells: C=3, D=0, n0=6, ties_a(score)=1, ties_b(label)=2.
    val rows = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L))
    val r = graft.ml.Evaluation.rankAssociation(rows.toDF("va", "vb"))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (3L, 0L, 6L, 1L, 2L))
    assert(r.getDouble(6) == 1.0) // gamma ignores all ties
    assert(r.getDouble(7) == 3.0 / 5.0) // D_b|a: pairs untied on score = 5
    assert(r.getDouble(8) == 0.75) // D_a|b: label-crossing pairs = 4
    // the Gini bridge: AUC = (3 + 0.5)/4 = 0.875 → 2·AUC−1 = 0.75
    val auc = graft.ml.Evaluation.aucExact(
      rows.toDF("score", "label")).collect().head
    assert(r.getDouble(8) == 2.0 * (auc.getLong(2) / 1e6) - 1.0)
    // degenerate: every pair tied on both axes → all three pinned 0
    val degen = graft.ml.Evaluation.rankAssociation(
      Seq((1L, 1L), (1L, 1L)).toDF("va", "vb")).collect().head
    assert(degen.getDouble(6) == 0.0 && degen.getDouble(7) == 0.0 &&
      degen.getDouble(8) == 0.0)
  }

  test("H16: Cohen's kappa — textbook 0.4, perfect disagreement -1, constant pinned 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // classic 2x2: 20 both-yes, 15 both-no, 5 A-only, 10 B-only
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(15)((0L, 0L)) ++
      Seq.fill(5)((1L, 0L)) ++ Seq.fill(10)((0L, 1L))
    val r = graft.ml.Evaluation.cohenKappa(rows.toDF("pred_a", "pred_b"))
      .collect().head
    // po = 35/50, pe = (25*30 + 25*20)/2500 = 1/2, kappa = .2/.5 = .4
    assert((r.getLong(0), r.getLong(1)) == (50L, 35L))
    assert((r.getLong(2), r.getLong(3)) == (700000L, 500000L))
    assert(r.getLong(4) == 400000L)
    // systematic disagreement: kappa = -1 exactly (sign-split path)
    val disagree = Seq((1L, 0L), (0L, 1L)).toDF("pred_a", "pred_b")
    assert(graft.ml.Evaluation.cohenKappa(disagree)
      .collect().head.getLong(4) == -1000000L)
    // both raters constant: pe = 1, pinned 0 (not NULL/NaN)
    val const = Seq((1L, 1L), (1L, 1L)).toDF("pred_a", "pred_b")
    assert(graft.ml.Evaluation.cohenKappa(const)
      .collect().head.getLong(4) == 0L)
    // categorical (string) raters go through the same cells
    val multi = Seq(("en", "en"), ("de", "de"), ("en", "de"))
      .toDF("pred_a", "pred_b")
    assert(graft.ml.Evaluation.cohenKappa(multi)
      .collect().head.getLong(1) == 2L)
  }

  test("H17: MCC — hand case 1/sqrt(6), perfect 1.0, zero marginal pinned 0") {
    import spark.implicits._
    // threshold 1: tp=4 fp=1 fn=2 tn=3 -> (12-2)/sqrt(5*6*4*5)
    val scored = (Seq.fill(4)((1L, 1L)) ++ Seq.fill(1)((1L, 0L)) ++
      Seq.fill(2)((0L, 1L)) ++ Seq.fill(3)((0L, 0L))).toDF("score", "label")
    val r = graft.ml.Evaluation.mccAtThreshold(scored).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 1L, 2L, 3L))
    assert(math.abs(r.getDouble(4) - 1.0 / math.sqrt(6.0)) < 1e-15)
    val perfect = Seq((1L, 1L), (1L, 1L), (0L, 0L), (0L, 0L))
      .toDF("score", "label")
    assert(graft.ml.Evaluation.mccAtThreshold(perfect)
      .collect().head.getDouble(4) == 1.0)
    // everything flagged: tn+fn = 0, pinned 0.0
    val allpos = Seq((5L, 1L), (7L, 0L)).toDF("score", "label")
    assert(graft.ml.Evaluation.mccAtThreshold(allpos)
      .collect().head.getDouble(4) == 0.0)
  }

  test("H18: ECE/MCE exact on the Brier hand case") {
    import spark.implicits._
    // same frame as the H12 test: phat 525000 (1 of 2), 275000 (0 of 2)
    val scored = Seq((0L, 1L), (0L, 0L), (-10000L, 0L), (-10000L, 0L))
      .toDF("score", "label")
    val r = graft.ml.Evaluation.expectedCalibrationError(scored)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == (4L, 2L))
    // |1e6*1 - 525000*2| + |0 - 275000*2| = 50000 + 550000; div 4
    assert(r.getLong(2) == 150000L)
    // per-bin floored gaps: |500000-525000|, |0-275000|
    assert(r.getLong(3) == 275000L)
  }

  test("H20: C-index — hand cases for every admissibility rule") {
    import spark.implicits._
    def c(rows: Seq[(Long, Long, Long)]) =
      graft.ml.Evaluation.concordanceIndex(
        rows.toDF("t", "is_event", "sbin")).collect().head
    // perfect risk ordering incl. a trailing censored row
    val perfect = c(Seq((1L, 1L, 2L), (2L, 1L, 1L), (3L, 0L, 0L)))
    assert((perfect.getLong(0), perfect.getLong(3), perfect.getLong(4)) ==
      (3L, 3L, 1000000L))
    // reversed scores: all discordant
    assert(c(Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
      .getLong(4) == 0L)
    // tied scores: half credit
    assert(c(Seq((1L, 1L, 1L), (2L, 0L, 1L))).getLong(4) == 500000L)
    // same-time (event, censored) IS comparable
    val sameT = c(Seq((1L, 1L, 2L), (1L, 0L, 1L)))
    assert((sameT.getLong(0), sameT.getLong(4)) == (1L, 1000000L))
    // same-time (event, event) is NOT: zero pairs, pinned coin flip
    val both = c(Seq((1L, 1L, 2L), (1L, 1L, 1L)))
    assert((both.getLong(3), both.getLong(4)) == (0L, 500000L))
    // censored-first pairs are inadmissible: censor at 1, event at 2
    assert(c(Seq((1L, 0L, 2L), (2L, 1L, 1L))).getLong(3) == 0L)
  }

  test("H20: grid C-index equals the brute-force pair count") {
    import spark.implicits._
    // deterministic mixed frame: 40 rows over t 0..4, sbin 0..3
    val rows = (0 until 40).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      ((h % 5).toLong, ((h / 5) % 2).toLong, ((h / 10) % 4).toLong)
    }
    var conc = 0L; var disc = 0L; var tied = 0L
    for (a <- rows.indices; b <- rows.indices if a != b) {
      val (ti, ei, si) = rows(a); val (tj, ej, sj) = rows(b)
      // driver a must be an event; partner observed beyond t_a, or
      // censored exactly at t_a
      if (ei == 1L && (tj > ti || (tj == ti && ej == 0L))) {
        if (si > sj) conc += 1
        else if (si < sj) disc += 1
        else tied += 1
      }
    }
    val r = graft.ml.Evaluation.concordanceIndex(
      rows.toDF("t", "is_event", "sbin")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      (conc, disc, tied), "pair masses must match brute force")
    assert(r.getLong(4) ==
      500000L * (2 * conc + tied) / (conc + disc + tied))
  }

  test("H22: Spearman rho — monotone 1, anti -1, midrank hand case, degenerate 0") {
    import spark.implicits._
    def rho(rows: Seq[(Long, Long)]) =
      graft.ml.Evaluation.spearmanRho(rows.toDF("va", "vb"))
        .collect().head.getDouble(1)
    assert(rho(Seq((1L, 1L), (2L, 2L), (3L, 3L))) == 1.0)
    assert(rho(Seq((1L, 3L), (2L, 2L), (3L, 1L))) == -1.0)
    // tie in va: midranks (1.5, 1.5, 3) vs (1, 2, 3) -> sqrt(3)/2
    assert(math.abs(rho(Seq((1L, 1L), (1L, 2L), (2L, 3L)))
      - math.sqrt(3.0) / 2.0) < 1e-12)
    // one axis constant: pinned 0, never NaN
    assert(rho(Seq((5L, 1L), (5L, 2L))) == 0.0)
  }

  test("H19: confusion matrix — exact row/col shares, zero cells absent") {
    import spark.implicits._
    val paired = (Seq.fill(3)(("en", "en")) ++ Seq(("en", "de")) ++
      Seq.fill(2)(("de", "de"))).toDF("lang", "pred_lang")
    val out = graft.ml.Evaluation
      .confusionMatrix(paired, truth = "lang", pred = "pred_lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out.size == 3, "the (de,en) zero cell must be absent")
    assert(out(("en", "en")) == ((3L, 4L, 3L, 750000L, 1000000L)))
    assert(out(("en", "de")) == ((1L, 4L, 3L, 250000L, 333333L)))
    assert(out(("de", "de")) == ((2L, 2L, 3L, 1000000L, 666666L)))
  }

  test("H12: Brier decomposition matches the hand case and its identity") {
    import spark.implicits._
    // margins 0 -> phat 525000 (labels 1,0); -10000 -> phat 275000 (0,0)
    val scored = Seq((0L, 1L), (0L, 0L), (-10000L, 0L), (-10000L, 0L))
      .toDF("score", "label")
    val r = graft.ml.Evaluation.brierDecomposition(scored).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 1L, 250000L))
    assert(r.getLong(3) == 163125000000L, s"brier=${r.getLong(3)}")
    assert(r.getLong(4) == 38125000000L)    // reliability
    assert(r.getLong(5) == 62500000000L)    // resolution
    assert(r.getLong(6) == 187500000000L)   // uncertainty = .25*.75
    assert(r.getLong(7) == 0L, "identity exact when ppm floors are exact")
  }
}
