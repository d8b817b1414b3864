package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.h32

/** D51 — Count-Min sketch heavy hitters (Cormode & Muthukrishnan '05).
  *
  * Unlike the D12 HLL/quantile sketches (engine-internal layouts →
  * rows-only oracle check), this sketch is built from FIRST-PRINCIPLES
  * md5 hashing, so DuckDB replays the identical depth×width counter
  * array and the oracle check is a full hash match — a sketch whose
  * exact semantics (est ≥ true count, overestimate bounded by
  * collisions) are themselves cross-engine verified.
  *
  * Shape: one pass over token occurrences builds the d×w counter table
  * (bounded at d·w rows REGARDLESS of corpus size — the whole point);
  * the candidate pass probes it with a BROADCAST join (the sketch is
  * KBs) and takes min over the d rows per key. Heavy-hitter gate:
  * est·phiDen ≥ N where N is total occurrences. At 100 TB the sketch
  * build is one map-side-combinable aggregation (d·w distinct keys →
  * near-total map-side collapse), and the probe side never shuffles
  * the sketch — this is exactly the shape a streaming/approx layer
  * serves when the exact groupBy would be too wide.
  *
  * Width is deliberately SMALL (512) so collisions actually occur at
  * test scale and the overestimate semantics are exercised, not
  * vacuous. */
object Sketches {

  /** D52 — KMV (k-minimum-values) distinct-count estimator (Bar-Yossef
    * et al. '02): hash the values, keep the k SMALLEST distinct hashes
    * per group, estimate |distinct| = (k-1)·2^32 div h_(k) — if the k-th
    * smallest hash sits at fraction f of the hash space, about k/f
    * distinct values exist. Pure integer arithmetic end to end, so the
    * estimate (not just the rows) is hash-verified cross-engine.
    *
    * The k-smallest multiset is exactly what the I20 TopKMinL aggregate
    * maintains: a k-element heap per group, map-side partials, O(groups
    * ·k) on the exchange — the sketch build never sorts or widens
    * beyond the (group, hash) distinct. Below k distinct values the
    * heap IS the value set and the estimate is exact by definition.
    * Set semantics via distinct on (group, hash) — hash collisions
    * merge identically in both engines. */
  def kmvDistinct(pairs: DataFrame, grp: String, v: String,
                  k: Int = 64): DataFrame = {
    val est = s"(${(k - 1).toLong * 4294967296L}L) div greatest(element_at(mins, -1), 1L)"
    pairs
      .select(col(grp),
        h32(concat(lit("kmv:"), col(v).cast("string"))).as("h"))
      .distinct()
      .groupBy(col(grp))
      .agg(graft.functions.TopKMinL(col("h"), k).as("mins"))
      .select(col(grp),
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(expr(est)).as("est_distinct"))
      .orderBy(col(grp))
  }

  /** D54 — KMV sketch SET ALGEBRA (the theta-sketch capability, Apache
    * DataSketches' headline use): distinct-count estimates for two
    * sets, their union, their intersection, and a Jaccard estimate —
    * WITHOUT ever materializing either set. Union sketch = k smallest
    * of the combined distinct hashes (exactly mergeable — this is why
    * KMV distributes); intersection via the ρ rule: of the union
    * sketch's k entries, the fraction present in BOTH side sketches
    * estimates |A∩B| / |A∪B|, so est_inter = ρ·est_union div k. When
    * the union sketch holds fewer than k hashes it IS the full hash
    * set and ρ is the exact intersection size. All sketch frames are
    * ≤ k rows — the only corpus-sized work is one (side, hash)
    * distinct; everything downstream is sketch-sized joins. Pure
    * integer arithmetic → the estimates hash-verify cross-engine. */
  def kmvSetOps(tagged: DataFrame, k: Int = 64): DataFrame = {
    val kl = k.toLong
    val est = expr(s"CASE WHEN cnt < $kl THEN cnt ELSE " +
      s"(${(k - 1).toLong * 4294967296L}L div greatest(kth, 1L)) END")
    val h = tagged
      .select(col("side"),
        h32(concat(lit("kmv:"), col("v").cast("string"))).as("h"))
      .distinct()
      .localCheckpoint(true) // shared by side + union sketches: one scan
    def sketch(df: DataFrame): DataFrame =
      df.agg(graft.functions.TopKMinL(col("h"), k).as("mins"))
        .select(col("mins"), size(col("mins")).cast("long").as("cnt"),
          element_at(col("mins"), -1).as("kth"))
    val a = sketch(h.filter(col("side") === 0L))
    val b = sketch(h.filter(col("side") === 1L))
    val u = sketch(h.select(col("h")).distinct())
    val rho = u.select(explode(col("mins")).as("h"))
      .join(a.select(explode(col("mins")).as("h")), Seq("h"))
      .join(b.select(explode(col("mins")).as("h")), Seq("h"))
      .agg(count(lit(1)).as("rho"))
    a.select(est.as("est_a"))
      .crossJoin(b.select(est.as("est_b")))
      .crossJoin(u.select(est.as("est_union"), col("cnt").as("u_cnt")))
      .crossJoin(rho)
      .select(col("est_a"), col("est_b"), col("est_union"),
        when(col("u_cnt") < kl, col("rho"))
          .otherwise(expr(s"(rho * est_union) div $kl")).as("est_inter"))
      .withColumn("jaccard_ppm",
        expr("(est_inter * 1000000) div greatest(est_union, 1)"))
  }

  /** D55 — first-principles HyperLogLog (Flajolet et al. '07),
    * completing the cross-engine-exact sketch trio (D51 count-min for
    * frequency, D52/D54 KMV for distinct/set algebra, D55 HLL for the
    * fixed-size distinct register file). m = 2^p registers; each md5
    * hash routes to register h mod m and contributes ρ(h div m) = the
    * 1-based position of the LOWEST set bit of the remaining bits
    * (P(ρ=k) = 2^-k — the trailing-zeros PCSA variant, computed with
    * pure integer ops: bit_count((w & -w) - 1) + 1, so both engines
    * replay it bit-for-bit; no leading-zeros intrinsic needed). The
    * register file is ONE map-side-combinable max-aggregation — at
    * 100 TB each task emits ≤ groups·m partial rows regardless of
    * input size, which is the entire point of the sketch.
    *
    * The harmonic-mean estimate stays integral: Σ 2^-M[j] is scaled by
    * 2^30 (ρ ≤ 33-p ≤ 29, so every term 2^(30-M) is a positive long and
    * absent registers contribute exactly 2^30), and
    * est = α_ppm·m²·2^30 div (10^6·S) — for p ≤ 6 the numerator fits a
    * long, so the ESTIMATE (not just the rows) hash-verifies in DuckDB.
    * Raw estimator only: the small-range linear-counting correction
    * needs ln(m/V) (transcendental → not cross-engine exact), so
    * `v_zero` (empty-register count) is emitted for the caller to
    * judge the regime instead. Expected rel. error 1.04/√m ≈ 13% at
    * p=6. */
  def hllDistinct(pairs: DataFrame, grp: String, v: String,
                  p: Int = 6): DataFrame =
    hllEstimate(hllRegisters(pairs, grp, v, p), grp, p)

  /** The (group, idx) → max-ρ register file. Split out because max is
    * exactly mergeable: run under a complete-mode streaming aggregation
    * this IS the F16 incrementally-maintained sketch state, bounded at
    * groups·m rows regardless of stream length. */
  def hllRegisters(pairs: DataFrame, grp: String, v: String,
                   p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 6,
      "p>6 overflows the long-integer estimate numerator")
    val m = 1L << p
    val maxRho = 33 - p // w = h div m has 32-p bits; w==0 gets max+1
    pairs
      .select(col(grp),
        h32(concat(lit("hll:"), col(v).cast("string"))).as("h"))
      .select(col(grp), expr(s"h % $m").as("idx"),
        expr(s"CASE WHEN h div $m = 0 THEN $maxRho ELSE " +
          s"bit_count(((h div $m) & -(h div $m)) - 1) + 1 END").as("rho"))
      .groupBy(col(grp), col("idx"))
      .agg(max(col("rho")).as("mreg"))
  }

  /** Finish the register file into the integer harmonic-mean estimate
    * (absent registers contribute exactly 2^30 to the scaled sum). */
  def hllEstimate(regs: DataFrame, grp: String, p: Int = 6): DataFrame = {
    val m = 1L << p
    // α_m from the HLL paper (m=16/32/64 have dedicated constants)
    val alphaPpm = p match {
      case 4 => 673000L; case 5 => 697000L; case 6 => 709000L
    }
    val num = alphaPpm * m * m * (1L << 30)
    regs
      .groupBy(col(grp))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 30 - mreg)"))
        .as("s_present"), count(lit(1)).as("n_present"))
      .select(col(grp),
        expr(s"CAST($num AS BIGINT) div " +
          s"(1000000 * (s_present + ($m - n_present) * ${1L << 30}))")
          .as("est_distinct"),
        (lit(m) - col("n_present")).cast("long").as("v_zero"))
      .orderBy(col(grp))
  }

  /** D58 — bitset distinct: EXACT distinct counts for dense bounded ID
    * domains (user ids, item ids after dictionary encoding) as packed
    * 64-bit words — the roaring-bitmap idea reduced to its Spark-native
    * core. Each id sets bit (id mod 63) of word (id div 63) — 63 bits
    * per word, because bit 63 of a signed BIGINT is the overflow bit;
    * `bit_or` folds words per (group, word) — associative and
    * commutative, so the aggregation is fully map-side combinable and
    * the shuffled state is ≤ groups·⌈domain/63⌉ longs REGARDLESS of row
    * count (at 10^9 ids that is 16 MB per group — the point where the
    * D52/D55 sketches take over; below it, this is exact AND cheaper
    * than a countDistinct's (group, id) expansion: the per-task partial
    * collapses duplicate ids into bits before anything shuffles).
    * The final count is Σ bit_count(word) — pure integer ops both
    * engines, so the EXACT count hash-verifies the packing itself. */
  def bitsetDistinct(pairs: DataFrame, grp: String, id: String): DataFrame =
    bitsetFinish(bitsetWords(pairs, grp, id), grp)

  /** The (group, word) → mask frame. Split out because bit_or is
    * exactly mergeable: under a complete-mode streaming aggregation
    * this IS the F18 incrementally-maintained exact-distinct state,
    * bounded at groups·⌈domain/63⌉ rows regardless of stream length. */
  def bitsetWords(pairs: DataFrame, grp: String, id: String): DataFrame =
    pairs
      // 63 bits per word: bit 63 would make 1<<63 overflow a signed
      // BIGINT, which DuckDB rejects loudly (and Spark wraps silently)
      .select(col(grp), expr(s"$id div 63").as("w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($id % 63 AS INT))").as("m"))
      .groupBy(col(grp), col("w"))
      .agg(bit_or(col("m")).as("mask"))

  /** Popcount finisher over the word frame (tiny). */
  def bitsetFinish(words: DataFrame, grp: String): DataFrame =
    words
      .groupBy(col(grp))
      .agg(sum(bit_count(col("mask"))).cast("long").as("n_distinct"),
        count(lit(1)).as("n_words"))
      .orderBy(col(grp))

  /** (j, bucket) per occurrence of column `tok`: j is baked into the
    * hashed string so the d rows use independent hash functions. */
  def cmsBucketed(df: DataFrame, depth: Int = 3, width: Int = 512): DataFrame =
    df.select(
      col("tok"),
      explode(array((0 until depth).map(j =>
        struct(lit(j.toLong).as("j"),
          pmod(h32(concat(lit(s"cm$j:"), col("tok"))), lit(width.toLong))
            .as("b"))): _*)).as("jb"))
      .select(col("tok"), col("jb.j").as("j"), col("jb.b").as("b"))

  /** The d×w counter table — ONE map-side-combinable aggregation, and
    * (run on a stream in complete mode) the F15 incrementally-maintained
    * state: counts are mergeable, so micro-batch folding lands on the
    * same counters as a batch build over the union of the batches. */
  def cmsCounters(toks: DataFrame, depth: Int = 3, width: Int = 512): DataFrame =
    cmsBucketed(toks, depth, width)
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))

  def countMinHeavyHitters(docs: DataFrame, depth: Int = 3, width: Int = 512,
                           phiDen: Long = 200): DataFrame = {
    val toks = docs
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    val sketch = cmsCounters(toks, depth, width)
    val est = cmsBucketed(toks.distinct(), depth, width)
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est_count"))
    est.crossJoin(broadcast(total))
      .filter(col("est_count") * phiDen >= col("n_total"))
      .select(col("tok"), col("est_count"))
      .orderBy(col("tok"))
  }
}
