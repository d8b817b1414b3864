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

  def countMinHeavyHitters(docs: DataFrame, depth: Int = 3, width: Int = 512,
                           phiDen: Long = 200): DataFrame = {
    val toks = docs
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    // (j, bucket) per occurrence: j is baked into the hashed string so
    // the d rows use independent hash functions
    def bucketed(df: DataFrame): DataFrame = df.select(
      col("tok"),
      explode(array((0 until depth).map(j =>
        struct(lit(j.toLong).as("j"),
          pmod(h32(concat(lit(s"cm$j:"), col("tok"))), lit(width.toLong))
            .as("b"))): _*)).as("jb"))
      .select(col("tok"), col("jb.j").as("j"), col("jb.b").as("b"))
    val sketch = bucketed(toks)
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))
    val est = bucketed(toks.distinct())
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est_count"))
    est.crossJoin(broadcast(total))
      .filter(col("est_count") * phiDen >= col("n_total"))
      .select(col("tok"), col("est_count"))
      .orderBy(col("tok"))
  }
}
