package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nonparametric rank tests (SURVEY.md §2 D92/D93/H27) — the
  * distribution-free complements to the exact-moment family: D37's
  * correlation and D38's z-scores assume the moments mean something;
  * these ask the same "did the distribution move / do the raters
  * agree" questions off RANKS alone, so a single 10⁹× outlier (one
  * fat-finger transaction) cannot swamp the verdict.
  *
  * All three ride the H4 contraction discipline: the corpus is first
  * contracted to DISTINCT values with per-side counts, and the only
  * ordered work (the rank prefix-sum window) runs over that frame —
  * bounded by value cardinality, never corpus size. Doubled average
  * ranks keep tie handling integral (a tie group over positions
  * [cum+1, cum+n] has 2·avgRank = 2·cum + n + 1), so every statistic
  * is exact BIGINT/DECIMAL arithmetic until one pinned IEEE
  * cast/sqrt/divide sequence (the q_corr precedent) or a floored
  * fixed-point `div` over nonnegative exact decimals (truncate ==
  * floor there, so Spark's `div` and DuckDB's `//` agree) —
  * bit-identical cross-engine with no rounding fudge.
  */
object RankTests {

  private val dec = DecimalType(38, 0)

  /** D92 — tie-corrected two-sample Mann–Whitney U / Wilcoxon rank-sum
    * (Ann. Math. Statist. 1947) per slice: grp ∈ {0,1} marks the two
    * samples, `v` the (integer) measurement. Emits the exact doubled
    * statistic 2·U₁ and the normal-approximation z with the exact tie
    * term Σ(t³−t) folded into the variance:
    * z = (2U₁ − n₁n₂) / √( n₁n₂·(N³−N−T) / (3N(N−1)) ).
    * Degenerate slices (one-sided, or all values tied) pin z = 0 with
    * the counts visible, never NULL.
    *
    * Scale shape: one agg contracts (slice, v) with per-group counts;
    * the cumulative window runs per slice over distinct values only.
    * Decimal(38) moments — N³ overflows BIGINT past ~2·10⁶ rows per
    * slice, long before any real slice does. */
  def mannWhitney(df: DataFrame): DataFrame =
    finishMannWhitney(mannWhitneyContract(df))

  /** The distinct-value contraction D92 ranks over: per (slice, v) the
    * total count and the group-1 count. Counters merge associatively,
    * so this frame doubles as the F38 streaming monitor's complete-
    * mode state — bounded by slice·value cardinality, never stream
    * length. */
  def mannWhitneyContract(df: DataFrame): DataFrame =
    df.groupBy(col("slice"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("grp")).as("n1v"))

  /** The non-associative back half (rank prefix-sums + the pinned IEEE
    * z sequence) over an already-contracted frame — shared VERBATIM by
    * the batch op and the F38 streaming finisher so live and batch can
    * never disagree on what "the distribution moved" means. */
  def finishMannWhitney(byVal: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("slice")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .groupBy(col("slice"))
      .agg(sum(col("n1v")).as("n1"),
        sum(col("n") - col("n1v")).as("n2"),
        sum(col("n1v") * (lit(2L) * col("cum") + col("n") + lit(1L)))
          .as("r1_x2"),
        sum(col("n").cast(dec) * col("n") * col("n") - col("n"))
          .as("ties"))
      .withColumn("u1_x2",
        col("r1_x2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("nn", (col("n1") + col("n2")).cast(dec))
      .withColumn("var_num",
        (col("n1").cast(dec) * col("n2"))
          * (col("nn") * col("nn") * col("nn") - col("nn") - col("ties")))
      .withColumn("var_den",
        lit(3).cast(dec) * col("nn") * (col("nn") - lit(1).cast(dec)))
      .select(col("slice"), col("n1"), col("n2"), col("u1_x2"),
        when(col("n1") === 0L || col("n2") === 0L || col("var_num") <= 0,
          lit(0.0))
          .otherwise(
            (col("u1_x2") - col("n1") * col("n2")).cast("double")
              / sqrt(col("var_num").cast("double")
                / col("var_den").cast("double")))
          .as("z"))
      .orderBy(col("slice"))
  }

  /** D93 — tie-corrected Kruskal–Wallis H (JASA 1952) across k groups
    * per slice: the k-sample extension of D92 (one-way ANOVA on
    * ranks). With doubled rank sums R2_g, 12·ΣR_g²/n_g = 3·ΣR2_g²/n_g,
    * so H = [3·Σ R2_g²/n_g]/(N(N+1)) − 3(N+1), and the tie correction
    * divides by 1 − Σ(t³−t)/(N³−N). Emitted as deterministic FLOORED
    * fixed-point ppm — every division is `div` over exact NONNEGATIVE
    * decimals applied in pinned order, so both engines floor
    * identically (exactness of the last µ-digit is traded for
    * bit-equality, the D68 discipline; the floor error is ≤1 ppm per
    * group, and the mathematically-nonnegative H is pinned at 0 if the
    * floors dip it below). Slices where all values tie (corr_den = 0)
    * pin both statistics to 0 with k and n visible.
    *
    * Scale: the (slice, v) contraction bounds the window; per-group
    * rank sums join the group counts back on (slice, v) — one extra
    * shuffle over the distinct-value frame, not the corpus. */
  def kruskalWallis(df: DataFrame): DataFrame = {
    val byVal = df.groupBy(col("slice"), col("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("slice")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("ar2", lit(2L) * col("cum") + col("n") + lit(1L))
    val perGroup = df.groupBy(col("slice"), col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
      .join(ranked.select(col("slice"), col("v"), col("ar2")),
        Seq("slice", "v"))
      .groupBy(col("slice"), col("g"))
      .agg(sum(col("c")).as("ng"),
        sum(col("c").cast(dec) * col("ar2")).as("r2g"))
    val ties = ranked.groupBy(col("slice"))
      .agg(sum(col("n").cast(dec) * col("n") * col("n") - col("n"))
        .as("ties"))
    // Floored division that STAYS DECIMAL: Spark's `div` narrows to
    // BIGINT and silently wraps once the quotient passes int64 (r2g² ≈
    // N⁴ does at ~10⁶ rows per slice — caught by the 10× tier, where
    // the wrapped terms drove H negative and the 0-pin swallowed it).
    // (a − a % b)/b is exact for nonnegative decimals: the remainder
    // subtraction makes the division exact, so the result scale carries
    // no rounding and DuckDB's `//` floors to the same integer.
    def floorDiv(a: String, b: String): String =
      s"CAST(($a - $a % $b) / $b AS DECIMAL(38,0))"
    perGroup
      .withColumn("ngd", col("ng").cast(dec))
      .withColumn("t2", expr("r2g * r2g * 3000000"))
      .withColumn("term", expr(floorDiv("t2", "ngd")))
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("k"),
        sum(col("ng")).as("n_tot"),
        sum(col("term")).as("s3m"))
      .join(ties, Seq("slice"))
      .withColumn("nd", col("n_tot").cast(dec))
      .withColumn("nn1", expr("nd * (nd + 1)"))
      .withColumn("h_raw",
        expr(floorDiv("s3m", "nn1")) -
          lit(3000000L).cast(dec) * (col("n_tot") + lit(1L)).cast(dec))
      .withColumn("h_nn",
        when(col("h_raw") < 0, lit(0).cast(dec)).otherwise(col("h_raw")))
      .withColumn("cube_n",
        col("nd") * col("nd") * col("nd") - col("nd"))
      .withColumn("corr_den", col("cube_n") - col("ties"))
      .withColumn("hc_num", expr("h_nn * cube_n"))
      .select(col("slice"), col("k"), col("n_tot"),
        when(col("corr_den") <= 0, lit(0L))
          .otherwise(col("h_nn").cast("long")).as("h_ppm"),
        when(col("corr_den") <= 0, lit(0L))
          .otherwise(expr(floorDiv("hc_num", "corr_den")).cast("long"))
          .as("h_corr_ppm"))
      .orderBy(col("slice"))
  }

  /** H27 — Kendall's W coefficient of concordance (Biometrika 1939)
    * with tie correction: m raters each rank the same n items; W ∈
    * [0,1] asks "do the raters induce the SAME ordering" (1 = perfect
    * concordance, 0 = no agreement beyond chance) — the m-rater
    * generalization of H22's pairwise Spearman, and the standard
    * multi-scorer sanity check before averaging model scores. With
    * doubled per-rater average ranks summed to R2_i,
    * 12ΣR_i² = 3ΣR2_i², so
    * W = (3ΣR2_i² − 3m²n(n+1)²) / (m²(n³−n) − m·ΣT_j),
    * T_j = Σ(t³−t) over rater j's tie groups. The numerator is
    * mathematically nonnegative (ΣR_i² is minimized exactly when all
    * rank sums are equal), so the single ppm `div` floors identically
    * on both engines. Emits (m, n, w_ppm) plus the large-sample
    * χ² = m(n−1)·W in the same fixed-point.
    *
    * Scale: ranks per rater come off the (rater, v) contraction
    * window; ΣR2_i² is one agg over the item frame. m is the caller's
    * bounded metric count (it built the long frame from m columns) —
    * passed, not counted, so no driver action hides here. */
  def kendallW(df: DataFrame, m: Int): DataFrame = {
    val byVal = df.groupBy(col("rater"), col("v"))
      .agg(count(lit(1)).as("t"))
    val w = Window.partitionBy(col("rater")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("ar2", lit(2L) * col("cum") + col("t") + lit(1L))
    val itemSums = df
      .join(ranked.select(col("rater"), col("v"), col("ar2")),
        Seq("rater", "v"))
      .groupBy(col("item"))
      .agg(sum(col("ar2")).as("r2i"))
    val ties = ranked
      .agg(coalesce(sum(col("t").cast(dec) * col("t") * col("t")
        - col("t")), lit(0).cast(dec)).as("tsum"))
    itemSums
      .agg(count(lit(1)).as("n_items"),
        sum(col("r2i").cast(dec) * col("r2i")).as("s2"))
      .crossJoin(broadcast(ties))
      .withColumn("m", lit(m.toLong))
      .withColumn("nd", col("n_items").cast(dec))
      .withColumn("md", col("m").cast(dec))
      .withColumn("num",
        lit(3).cast(dec) * col("s2")
          - lit(3).cast(dec) * col("md") * col("md") * col("nd")
            * (col("nd") + lit(1).cast(dec))
            * (col("nd") + lit(1).cast(dec)))
      .withColumn("den",
        col("md") * col("md")
          * (col("nd") * col("nd") * col("nd") - col("nd"))
          - col("md") * col("tsum"))
      .select(col("m"), col("n_items"),
        when(col("den") <= 0, lit(0L))
          .otherwise(expr("CAST(num * 1000000 div den AS BIGINT)"))
          .as("w_ppm"),
        when(col("den") <= 0, lit(0L))
          .otherwise(expr(
            "CAST(num * 1000000 * m * (n_items - 1) div den AS BIGINT)"))
          .as("chi2_ppm"))
  }
}
