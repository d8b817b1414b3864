package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, MarketBasket}

/** Hand-computed semantics for the D31–D33 event-analytics operators. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("time-weighted average weights each value by its holding duration") {
    // user 1: v=100 held for 10us, then v=300 held for 30us, last event
    // open-ended (excluded). twa = (100*10 + 300*30) / 40 = 250.0
    val ev = Seq((1L, 0L, 100L), (1L, 10L, 300L), (1L, 40L, 999L))
      .toDF("user_id", "ts_us", "v_cents")
    val r = Analytics.timeWeightedAvg(ev).collect()(0)
    assert(r.getLong(1) == 100L * 10 + 300L * 30)
    assert(r.getLong(2) == 40L)
    assert(r.getDouble(3) == 250.0)
  }

  test("funnel demands strict temporal order across steps") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE view, purchase after — click doesn't count,
      // so the funnel stalls at stage 1
      (2L, 20L, "view"), (2L, 10L, "click"), (2L, 30L, "purchase"),
      // user 3: view only
      (3L, 10L, "view"),
      // user 4: never viewed -> not in the funnel at all
      (4L, 10L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val out = Analytics.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("cohort retention counts distinct users per (cohort, offset) week") {
    val wk = 604800000000L
    val ev = Seq(
      (1L, 0L), (1L, wk + 1), (1L, 2 * wk + 1),   // cohort 0, offsets 0,1,2
      (2L, 5L), (2L, 2 * wk + 9),                 // cohort 0, offsets 0,2
      (3L, wk + 7), (3L, wk + 8))                 // cohort 1, offset 0 (dedup)
      .toDF("user_id", "ts_us")
    val out = Analytics.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("D59: pattern episodes count non-overlapping matches in time order") {
    // user 1 in time order: v c c p v p x(error) v c  → seq "vccpvpev c"?
    //   codes: v,c,c,p,v,p,e,v,c → "vccpvpevc"
    //   vc*p episodes: "vccp" at 0, "vp" at 4 → 2; trailing "vc" unmatched
    //   vp direct: only position 4 → 1
    // user 2: p v (purchase before view) → no episodes
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "click"),
      (1L, 40L, 4L, "purchase"), (1L, 50L, 5L, "view"),
      (1L, 60L, 6L, "purchase"), (1L, 70L, 7L, "error"),
      (1L, 80L, 8L, "view"), (1L, 90L, 9L, "click"),
      (2L, 10L, 10L, "purchase"), (2L, 20L, 11L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Analytics.patternEpisodes(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (("vccpvpevc", 2L, 1L)))
    assert(out(2L) == (("pv", 0L, 0L)))
  }

  test("D59: ties on ts break on event_id and greedy runs absorb clicks") {
    // same ts: event_id orders c(1) before v(2)? No — sorted by (ts,
    // event_id): (10,1,v),(10,2,c),(20,3,p) → "vcp" → one episode.
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"), (1L, 20L, 3L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val r = Analytics.patternEpisodes(ev).collect()(0)
    assert(r.getString(2) == "vcp" && r.getLong(3) == 1L)
  }

  test("D60: co-purchase counts distinct-basket pairs with exact ppm lift") {
    // baskets: o1{1,2,3} o2{1,2} o3{1,2} o4{3,4} o5{4}; the duplicate
    // (o2,1) line must not double-count. Only (1,2) reaches support 2:
    // n=3, nf1=nf2=3, tot=5 → lift = 3·5·10⁶ div 9 = 1_666_666.
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L), (4L, 4L),
      (5L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val out = MarketBasket.coPurchase(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 1666666L)))
  }

  test("D57: EWMA folds in time order regardless of row order, exact halves") {
    import spark.implicits._
    // time order 100, 50, 30: s = 0 → 50 → 50 → 40
    val rows = Seq(
      (1L, 300L, 3L, 30L), (1L, 100L, 1L, 100L), (1L, 200L, 2L, 50L),
      (2L, 100L, 9L, 7L)) // single txn: (0+7) div 2 = 3 (floor)
    val out = Analytics.ewmaBaseline(
      rows.toDF("user_id", "ts_us", "event_id", "amt_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((3L, 40L)), 2L -> ((1L, 3L))))
    // tie on ts: event_id breaks it — (0+10)/2=5, (5+20)/2=12 vs
    // reversed would be (0+20)/2=10, (10+10)/2=10
    val tie = Seq((1L, 100L, 1L, 10L), (1L, 100L, 2L, 20L))
    val r = Analytics.ewmaBaseline(
      tie.toDF("user_id", "ts_us", "event_id", "amt_cents"))
      .collect().head
    assert(r.getLong(2) == 12L)
  }

  test("D61: linear credit splits per conversion; last touch takes the latest") {
    // user 1, conversion at t=100 (id 10): touches view@40 (id 1),
    //   click@60 (id 2), view@90 (id 3) → n=3, each gets 333333 ppm,
    //   last touch = view@90.
    // user 1, conversion at t=50 (id 11): touches view@40 only (click@60
    //   and view@90 are AFTER it) → n=1, 1000000 ppm, last touch view.
    // user 2: touch outside the lookback (conv 1000100, touch at 90 with
    //   lookback 1000) → unattributed, contributes nothing.
    // user 3: last-touch tie on ts between click(id 7) and view(id 6) at
    //   t=80 → higher event_id (click) wins the tie-break.
    val ev = Seq(
      (1L, 40L, 1L, "view"), (1L, 60L, 2L, "click"), (1L, 90L, 3L, "view"),
      (1L, 100L, 10L, "purchase"), (1L, 50L, 11L, "purchase"),
      (2L, 90L, 5L, "view"), (2L, 1000100L, 12L, "purchase"),
      (3L, 80L, 6L, "view"), (3L, 80L, 7L, "click"),
      (3L, 85L, 13L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Analytics.attribution(ev, lookbackUs = 1000L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // view: conv10 gives 2 touches (333333 x2), conv11 one (1000000),
    //   conv13 one (500000); 4 touchpoints over 3 conversions; last-touch
    //   winner on conv10 (view@90) and conv11 only.
    assert(out("view") == (4L, 3L, 333333L * 2 + 1000000L + 500000L, 2L))
    // click: conv10 (333333) + conv13 (500000, wins tie on event_id)
    assert(out("click") == (2L, 2L, 333333L + 500000L, 1L))
  }

  test("D62: Markov transitions pair consecutive events per user, ppm by row") {
    // user 1 in time order: v c c p → transitions v→c, c→c, c→p
    // user 2: p v → p→v; no cross-user pair (user 2's v is terminal).
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "click"),
      (1L, 40L, 4L, "purchase"),
      (2L, 10L, 5L, "purchase"), (2L, 20L, 6L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Analytics.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("view", "click") -> (1L, 1000000L),
      ("click", "click") -> (1L, 500000L),
      ("click", "purchase") -> (1L, 500000L),
      ("purchase", "view") -> (1L, 1000000L)))
  }

  test("D63: RFM quintile scores come off the domain histogram, ties shared") {
    // Five customers, one order each except cust 5 (two orders).
    // recency days: 1,2,3,4,5  → scores 1..5 (all distinct)
    // frequency: 1,1,1,1,2     → the four ties get 1 + 5*0 div 5 = 1,
    //                            cust 5 gets 1 + 5*4 div 5 = 5
    // monetary dollars: 10,20,30,40,60 → scores 1..5
    val day = 86400000000L
    val orders = Seq(
      (1L, 1L * day, 1000L), (2L, 2L * day, 2000L), (3L, 3L * day, 3000L),
      (4L, 4L * day, 4000L), (5L, 5L * day, 3000L), (5L, 1L * day, 3000L))
      .toDF("o_custkey", "ts_us", "price_cents")
      .select(col("o_custkey"), expr("ts_us div 86400000000").as("epoch_day"),
        col("price_cents"))
    val out = Analytics.rfmSegments(orders).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getString(8))).toMap
    assert(out(1L) == (1L, 1L, 1L, 111L, "hibernating"))
    assert(out(2L) == (2L, 1L, 2L, 212L, "hibernating"))
    assert(out(3L) == (3L, 1L, 3L, 313L, "core"))
    assert(out(4L) == (4L, 1L, 4L, 414L, "new"))
    assert(out(5L) == (5L, 5L, 5L, 555L, "champion"))
  }

  test("D65: Benford screen — digit grid completed, ppm shares, chi2 fold") {
    // group A amounts → cents → first digits: 1.00→1, 1.23→1, 25.00→2,
    // 0.09→9; n_grp=4. obs_ppm: d1=500000, d2=250000, d9=250000, rest 0.
    val df = Seq(("A", 1.00), ("A", 1.23), ("A", 25.00), ("A", 0.09))
      .toDF("grp", "amount")
    val out = Analytics.benfordScreen(df, "grp", "amount").collect()
    assert(out.length == 9)                       // full digit grid, one group
    val byDigit = out.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(byDigit(1L) == (2L, 500000L, 500000L - 301030L))
    assert(byDigit(2L) == (1L, 250000L, 250000L - 176091L))
    assert(byDigit(9L) == (1L, 250000L, 250000L - 45757L))
    assert(byDigit(5L) == (0L, 0L, -79181L))      // absent digit surfaces
    // chi2_scaled = Σ dev² div exp, folded here independently
    val chi2 = out.map(r => r.getLong(5) * r.getLong(5) / r.getLong(4)).sum
    assert(out.forall(_.getLong(6) == chi2))
    // Benford expectations sum to exactly one million ppm
    assert(Analytics.BenfordPpm.values.sum == 1000000L)
  }

  test("D66: CUSUM via the prefix identity equals the max(0,·) recurrence") {
    // type a: 10,10,10,30,30,30 → mu=20, slack=2; the hand recurrence
    // S_hi = max(0, S + (x-mu-slack)) gives 0,0,0,8,16,24 — alarm on
    // day 5 (24 > mu); the low side peaks at 24 on day 2 (early deficit)
    val counts = Seq(10, 10, 10, 30, 30, 30)
    val ev = counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map(i => ("a", day * 86400000000L + i))
    }.toDF("event_type", "ts_us")
    val out = Analytics.cusumShifts(ev).collect()
      .map(r => r.getLong(1) -> (r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(out(0L) == (0L, 8L, 0L) && out(1L) == (0L, 16L, 0L))
    assert(out(2L) == (0L, 24L, 1L))           // low-side alarm fires early
    assert(out(3L) == (8L, 12L, 0L) && out(4L) == (16L, 0L, 0L))
    assert(out(5L) == (24L, 0L, 1L))           // high-side alarm at the end
    // independent fold of the textbook recurrence over the same series
    val (mu, slack) = (20L, 2L)
    val rec = counts.scanLeft(0L)((s, x) => math.max(0L, s + x - mu - slack))
      .drop(1)
    assert(counts.indices.forall(i => out(i.toLong)._1 == rec(i)))
  }

  test("D66: a flat series accumulates nothing and never alarms") {
    val ev = (0 until 6).flatMap(day =>
      (0 until 10).map(i => ("b", day * 86400000000L + i)))
      .toDF("event_type", "ts_us")
    val out = Analytics.cusumShifts(ev).collect()
    assert(out.forall(r => r.getLong(5) == 0L && r.getLong(6) == 0L &&
      r.getLong(7) == 0L))
  }

  test("D68: OLS trend is the exact rational, sign-split for both engines") {
    // up: 10,20,30/day → slope exactly +10/day; down: mirrored; flat
    // single-day key → den = 0 → slope 0 (documented, not NULL)
    val ev = Seq.tabulate(10)(i => ("up", 0L * 86400000000L + i)) ++
      Seq.tabulate(20)(i => ("up", 1L * 86400000000L + i)) ++
      Seq.tabulate(30)(i => ("up", 2L * 86400000000L + i)) ++
      Seq.tabulate(30)(i => ("down", 0L * 86400000000L + i)) ++
      Seq.tabulate(20)(i => ("down", 1L * 86400000000L + i)) ++
      Seq.tabulate(10)(i => ("down", 2L * 86400000000L + i)) ++
      Seq.tabulate(7)(i => ("one", i.toLong))
    val out = Analytics.volumeTrend(ev.toDF("event_type", "ts_us")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // k=3 sx=3 sy=60 sxx=5 sxy=80 → num=60 den=6 → slope 10/day
    assert(out("up") == (3L, 60L, 60L, 6L, 10000000L))
    assert(out("down") == (3L, 60L, -60L, 6L, -10000000L))
    assert(out("one") == (1L, 7L, 0L, 0L, 0L))
  }

  test("D69: a purely periodic series has zero residuals and no alarms") {
    val day = 86400000000L
    val ev = (0 until 14).flatMap { d =>
      val n = if (d % 7 >= 5) 50 else 10
      (0 until n).map(i => ("a", d * day + i))
    }.toDF("event_type", "ts_us")
    val out = Analytics.seasonalAnomalies(ev).collect()
    assert(out.forall(r => r.getLong(5) == 0L && r.getLong(7) == 0L))
  }

  test("D69: MAD off the residual histogram gates dow-mean outliers") {
    // two regular weeks (counts 10/14 per dow → residuals ∓2 after the
    // dow mean 12) plus a third-week spike on dow 0 (count 40):
    // dow0 mean = (10+14+40) div 3 = 21, residuals −11, −7, +19;
    // abs residuals sorted: 2×12, 7, 11, 19 → lower median (8th of 15)
    // = 2 → gate 3·2 = 6 → exactly days 0, 7, 14 alarm
    val day = 86400000000L
    val ev = ((0 until 14).flatMap { d =>
      val n = if (d < 7) 10 else 14
      (0 until n).map(i => ("a", d * day + i))
    } ++ (0 until 40).map(i => ("a", 14 * day + i)))
      .toDF("event_type", "ts_us")
    val out = Analytics.seasonalAnomalies(ev).collect()
      .map(r => r.getLong(1) -> (r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(out.values.forall(_._2 == 2L), "MAD must be 2 for every row")
    assert(out(0L) == (-11L, 2L, 1L))
    assert(out(7L) == (-7L, 2L, 1L))
    assert(out(14L) == (19L, 2L, 1L))
    assert(out.filter(_._2._3 == 1L).keySet == Set(0L, 7L, 14L))
  }

  test("D70: gaps-and-islands splits runs and reports gap widths") {
    val day = 86400000000L
    val ev = Seq(0L, 1L, 2L, 5L, 6L, 9L).zipWithIndex.map { case (d, i) =>
      ("a", d * day + i)
    }.toDF("event_type", "ts_us")
    val out = Analytics.calendarIslands(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 3L, 3L, 2L),   // days 0-2, then a 2-day hole
      (5L, 6L, 2L, 2L, 2L),   // days 5-6, then a 2-day hole
      (9L, 9L, 1L, 1L, 0L)))  // the last island carries gap 0
  }

  test("D71: contingency chi2 is the exact rational of the four cells") {
    // variant 0 (even ids): 2 of 5 convert; variant 1: 3 of 5.
    // chi2 = 10·(2·2 − 3·3)² / (5·5·5·5) = 10·25/625 = 0.4
    val ev = (0L until 10L).flatMap { u =>
      val converts = (u % 2 == 0 && u < 4) || (u % 2 == 1 && u < 6)
      Seq((u, if (converts) "purchase" else "view",
        if (converts) 200.0 else 5.0),
        (u, "purchase", 10.0))   // a LOW-value purchase never converts
    }.toDF("user_id", "event_type", "value")
    val r = Analytics.abContingency(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 3L, 3L, 2L))
    assert(r.getLong(4) == 10L)
    assert(r.getLong(5) == 400000L && r.getLong(6) == 600000L)
    assert(math.abs(r.getDouble(7) - 0.4) < 1e-12)
  }

  test("D65: a Benford-conforming sample scores near zero, a uniform one high") {
    // 1000 amounts whose first-digit histogram matches Benford to the ppm
    val benford = Analytics.BenfordPpm.toSeq.flatMap { case (d, p) =>
      Seq.fill(math.round(p / 1000.0).toInt)(("b", d * 100.0))
    }
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(("u", d * 100.0)))
    val out = Analytics
      .benfordScreen((benford ++ uniform).toDF("grp", "amount"), "grp", "amount")
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(out("b") < 100L, s"conforming chi2=${out("b")}")
    assert(out("u") > 50000L, s"uniform chi2=${out("u")}")
  }

  test("D73: structuring flags trailing windows, inclusive lower bound") {
    // threshold 100, window 100us, flag at >=3 txns summing >=150
    val ev = Seq(
      // user 1: window ending at ts=100 spans [0,100] INCLUSIVE — the
      // txn AT exactly ts-100=0 must count (probe sorts before it)
      (1L, 0L, 10L, 50L), (1L, 50L, 11L, 60L), (1L, 100L, 12L, 70L),
      (1L, 250L, 13L, 80L),
      // user 2: an over-threshold txn is NOT a smurf piece; remaining
      // two can't reach the count gate
      (2L, 0L, 20L, 120L), (2L, 10L, 21L, 30L), (2L, 20L, 22L, 40L),
      // user 3: two overlapping flagged windows; peak over both
      (3L, 0L, 30L, 60L), (3L, 10L, 31L, 60L), (3L, 20L, 32L, 60L),
      (3L, 30L, 33L, 60L))
      .toDF("user_id", "ts_us", "event_id", "amt_cents")
    val out = Analytics.structuring(ev, thresholdCents = 100L,
        windowUs = 100L, minTxn = 3L, minSumCents = 150L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((1L, 180L, 3L, 100L)),
      3L -> ((2L, 240L, 4L, 20L))))
  }

  test("D77: velocity features — per-horizon inclusive trailing windows") {
    val ev = Seq((1L, 0L, 1L, 5L), (1L, 8L, 2L, 7L), (1L, 50L, 3L, 11L))
      .toDF("user_id", "ts_us", "event_id", "amt_cents")
    val out = Analytics.velocityFeatures(ev,
        windowsUs = Seq(("a", 10L), ("b", 100L)))
      .collect().map(r => r.getLong(2) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // (cnt_a, sum_a, cnt_b, sum_b); each window includes the txn itself
    assert(out(1L) == ((1L, 5L, 1L, 5L)))
    assert(out(2L) == ((2L, 12L, 2L, 12L)))   // ts 0 inside [-2, 8]
    assert(out(3L) == ((1L, 11L, 3L, 23L)))   // short window resets
  }

  test("D74: ACF of an alternating series is negative at lag 1, " +
      "positive at lag 2; zero days are completed into the grid") {
    val day = 86400000000L
    // type a: x = [1,3,1,3,1,3] over days 0..5
    val a = Seq(0, 1, 2, 3, 4, 5).flatMap(d =>
      Seq.fill(if (d % 2 == 0) 1 else 3)(("a", d * day)))
    // type b: days 0 and 2 only -> grid completes day 1 as x=0:
    // x = [2,0,2], c = 3x-4 = [2,-4,2], den=24, lag1 num=-16, lag2 num=4
    val b = Seq.fill(2)(("b", 0L)) ++ Seq.fill(2)(("b", 2 * day))
    val ev = (a ++ b).toDF("event_type", "ts_us")
    val out = Analytics.acfProfile(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // a: c = 6x-12 = [-6,6,...], den=216; lag1: 5*(-36) -> -833333;
    // lag2: 4*36=144 -> 666666
    assert(out(("a", 1L)) == -833333L)
    assert(out(("a", 2L)) == 666666L)
    assert(out(("b", 1L)) == -666666L)
    assert(out(("b", 2L)) == 166666L)
  }

  test("D78: Theil-Sen slope ignores the outlier day OLS would chase") {
    val day = 86400000000L
    // days 0..3 grow by exactly 1/day; day 4 is a 50-count flash crowd.
    // 6 of the 10 pairwise slopes are 1e6; the 4 outlier pairs are all
    // larger; the lower median (rank 5 of 10) stays 1e6.
    val counts = Seq(1, 2, 3, 4, 50)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("a", d * day)) }.toDF("event_type", "ts_us")
    val r = Analytics.theilSenTrend(ev).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (5L, 10L, 1000000L))
  }

  test("D76: Gini is 0 for equal spend, 1 for one-owner, exact between") {
    val t = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 2L),
      ("eq", 1L, 5L), ("eq", 2L, 5L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 5L))
      .toDF("grp", "user_id", "amt_cents")
    val out = Analytics.giniProfile(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // g: sorted [1,1,2], gnum = -2+0+4 = 2, gini = 2e6/(2*4) = 250000;
    // bottom50 (i<=1): 1/4; top10 (i>2): 2/4
    assert(out("g") == ((250000L, 250000L, 500000L)))
    assert(out("eq")._1 == 0L)
    assert(out("one")._1 == 1000000L)
  }

  test("D81: Pettitt finds the level shift; earliest argmax pinned; " +
      "zero days in the grid") {
    val day = 86400000000L
    // a: [1,1,1,5,5,5] -> V = [-3,-3,-3,3,3,3], U = -3,-6,-9,-6,-3;
    // K=9 at day 2 (the true break), U_n=0 excluded
    val a = Seq(0, 1, 2, 3, 4, 5).flatMap(d =>
      Seq.fill(if (d < 3) 1 else 5)(("a", d * day)))
    // b: [5,1,5] -> U = 1,-1; |U| ties at 1 -> earliest day 0 pinned
    val b = Seq.fill(5)(("b", 0L)) ++ Seq.fill(1)(("b", 1 * day)) ++
      Seq.fill(5)(("b", 2 * day))
    // c: events on days 0 and 2 only; grid completes day 1 as x=0 ->
    // x=[2,0,2], U = 1,-1 -> K=1 at day 0
    val c = Seq.fill(2)(("c", 0L)) ++ Seq.fill(2)(("c", 2 * day))
    val out = Analytics.pettittChangepoint(
      (a ++ b ++ c).toDF("event_type", "ts_us")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((6L, 2L, 9L, -9L)))
    assert(out("b")._2 == 0L && out("b")._3 == 1L)
    assert(out("c") == ((3L, 0L, 1L, 1L)))
  }

  test("D82: Fano is 1 on the hand case, 0 for constant, pinned for 1 day") {
    val day = 86400000000L
    // a: [1,3] -> varnum = 2*10-16 = 4, var=2e6, mean=2e6, fano=1e6
    val a = Seq.fill(1)(("a", 0L)) ++ Seq.fill(3)(("a", day))
    val b = Seq.fill(2)(("b", 0L)) ++ Seq.fill(2)(("b", day))
    val c = Seq.fill(4)(("c", 0L))
    val out = Analytics.dispersionIndex(
      (a ++ b ++ c).toDF("event_type", "ts_us")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((2L, 2000000L, 2000000L, 1000000L)))
    assert(out("b") == ((2L, 2000000L, 0L, 0L)))
    assert(out("c") == ((1L, 4000000L, 0L, 0L)))
  }

  test("D83: runs test — regime case, oscillation case, one-sided pinned") {
    val day = 86400000000L
    // a: [5,5,5,1,1,1,3] -> med 3 (excluded), signs +++--- -> R=2
    val a = Seq(5, 5, 5, 1, 1, 1, 3).zipWithIndex.flatMap { case (x, d) =>
      Seq.fill(x)(("a", d * day)) }
    // b: [4,1,4,1,4,2] -> med 2 (excluded), signs +-+-+ -> R=5
    val b = Seq(4, 1, 4, 1, 4, 2).zipWithIndex.flatMap { case (x, d) =>
      Seq.fill(x)(("b", d * day)) }
    val out = Analytics.runsTest(
      (a ++ b).toDF("event_type", "ts_us")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ra = out("a")
    assert((ra._1, ra._2, ra._3) == (2L, 3L, 3L))
    // za = 6*1-18 = -12, zc = 2*9*12 = 216, z = -12*sqrt(5)/sqrt(216)
    assert(math.abs(ra._4 -
      -12.0 * math.sqrt(5.0) / math.sqrt(216.0)) < 1e-15)
    val rb = out("b")
    assert((rb._1, rb._2, rb._3) == (5L, 3L, 2L))
    // za = 5*4-12 = 8, zc = 2*6*7 = 84
    assert(math.abs(rb._4 -
      8.0 * math.sqrt(4.0) / math.sqrt(84.0)) < 1e-15)
    // one-sided: [3,1,3] -> med 3, only the 1 survives -> n2-only, z=0
    val c = Seq(3, 1, 3).zipWithIndex.flatMap { case (x, d) =>
      Seq.fill(x)(("c", d * day)) }
    val rc = Analytics.runsTest(c.toDF("event_type", "ts_us"))
      .collect().head
    assert(rc.getLong(2) == 0L && rc.getDouble(4) == 0.0)
  }

  test("D85: quantile ladder — exact ranks, ties share a bucket, p50 = D19") {
    // grp a: values 1..10 -> p25 at rank 3, p50 rank 5, p75 rank 8,
    // p90 rank 9, p99 rank 10
    val a = (1 to 10).map(v => ("a", v.toLong))
    // grp b: 1,1,1,9 -> n=4: p25 r1->1, p50 r2->1, p75 r3->1,
    // p90 r4->9, p99 r4->9
    val b = Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 9L))
    val out = Analytics.quantileLadder((a ++ b).toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("a", 25L)) == 3L && out(("a", 50L)) == 5L)
    assert(out(("a", 75L)) == 8L && out(("a", 90L)) == 9L)
    assert(out(("a", 99L)) == 10L)
    assert(out(("b", 25L)) == 1L && out(("b", 50L)) == 1L)
    assert(out(("b", 75L)) == 1L && out(("b", 90L)) == 9L)
    assert(out.size == 10, "exactly one row per (group, p)")
  }

  test("B26: freshness — lag vs frontier, stale flag at the budget") {
    val s = 1000000L
    val ev = Seq(("live", 0L), ("live", 200000L * s),
      ("stale", 100L * s), ("quiet", 199999L * s))
      .toDF("event_type", "ts_us")
    val out = Analytics.freshness(ev, staleAfterS = 100000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out("live") == ((0L, 0L)))
    assert(out("stale") == ((199900L, 1L)))
    assert(out("quiet") == ((1L, 0L)))
  }

  test("D86: weekly movers — exact ppm deltas, dead week completed, " +
      "0-baseline pinned, first week excluded") {
    val wk = 604800000000L
    // weeks: n = [2, 3, 0(dead), 1]
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(3)(wk) ++ Seq.fill(1)(3 * wk))
      .map(ts => ("a", ts)).toDF("event_type", "ts_us")
    val out = Analytics.weeklyMovers(ev).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "first week has no baseline")
    assert(out(1L) == ((3L, 2L, 500000L)))
    assert(out(2L) == ((0L, 3L, -1000000L)))
    assert(out(3L) == ((1L, 0L, 1000000L)), "0 -> n re-entry pinned")
  }

  test("D84: inter-arrival octaves — gap 0 in bucket 1, tie order pinned") {
    val s = 1000000L
    // user 1: ts 0, 1s, 3s, 3s (ids 1..4) -> gaps 1s, 2s, 0s
    // buckets: bl(2)=2, bl(3)=2, bl(1)=1
    val ev = Seq((1L, 0L, 1L, "a"), (1L, 1 * s, 2L, "a"),
      (1L, 3 * s, 3L, "a"), (1L, 3 * s, 4L, "a"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Analytics.interArrivalProfile(ev).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 333333L)))
    assert(out(2L) == ((2L, 1L, 2L, 666666L)))
    // cross-user gaps never form: two users, one event each
    val solo = Seq((1L, 0L, 1L, "b"), (2L, 5 * s, 2L, "b"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    assert(Analytics.interArrivalProfile(solo).count() == 0L)
  }

  test("D80: ABC classes land on the exact 70/90 boundaries, ties by key") {
    // 10 unit rows at $1.00, disc 0: rev_cp = 10000 per row
    val li = (Seq.fill(7)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(1)(3L))
      .map(pk => (pk, 1.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Analytics.paretoClasses(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cum shares: p1 70% (<=70 -> A), p2 90% (<=90 -> B), p3 C
    assert(out("A") == ((1L, 70000L, 700000L)))
    assert(out("B") == ((1L, 20000L, 200000L)))
    assert(out("C") == ((1L, 10000L, 100000L)))
  }
}
