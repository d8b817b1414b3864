package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** I15 — Bloom-filter semi-join prefilter (the explicit form of a
  * runtime join filter, reference semantics: plain `IN`-subquery
  * semi-join).
  *
  * At 100 TB the expensive part of `fact SEMI JOIN dim` is shuffling
  * the fact side; when the dim key set is selective, almost all of that
  * shuffle is wasted on rows that match nothing. A Bloom filter built
  * over the dim keys drops those rows BEFORE the exchange: shuffle
  * volume then scales with the match count, not the corpus. Spark's
  * own `runtime.bloomFilter` does this transparently for some plans;
  * this operator is the guaranteed, composable form (and the pattern
  * works for any key expression, not just join columns).
  *
  * Representation: the filter is a TABLE of (word index, 64-bit word)
  * — built with one explode + bit_or aggregation over the dim keys,
  * `mBits/64` rows total regardless of dim cardinality — broadcast and
  * probed with integer bit ops only, so the probe stays inside
  * whole-stage codegen. No driver-side state, no UDF, no collect.
  *
  * No false negatives (the semi-join after the prefilter returns
  * exactly the plain semi-join's rows — `q_bloom_semi` hash-checks
  * this); false positives only cost prefilter leakage, bounded by the
  * usual (1-e^{-kn/m})^k with n = dim keys.
  */
object BloomPrune {

  private def bitPos(key: org.apache.spark.sql.Column, i: Int, mBits: Int) =
    pmod(xxhash64(key, lit(i)), lit(mBits.toLong))

  /** Build the (w, word) Bloom table over `keys(keyCol)`. `mBits` must
    * be a power of two; the result has at most mBits/64 rows. */
  def buildBits(keys: DataFrame, keyCol: String,
                mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    require((mBits & (mBits - 1)) == 0, s"mBits must be a power of two: $mBits")
    keys
      .select(explode(array((0 until k).map(i =>
        bitPos(col(keyCol), i, mBits)): _*)).as("pos"))
      // dynamic shift amounts need the SQL form — the Scala shiftleft
      // overload only takes a literal Int
      .select(shiftright(col("pos"), 6).as("w"),
        expr("shiftleft(1L, cast(pos & 63 as int))").as("m"))
      .groupBy(col("w"))
      .agg(bit_or(col("m")).as("word"))
  }

  /** Keep only fact rows whose `factKey` might be in the filter: k
    * broadcast hash-lookups into the word table, each a pure bit test.
    * A missing word row means no bit set there — the inner join drops
    * the row, which is exactly the "bit clear" verdict. */
  def prefilter(fact: DataFrame, factKey: String, bits: DataFrame,
                mBits: Int = 1 << 16, k: Int = 3): DataFrame =
    (0 until k).foldLeft(fact) { (df, i) =>
      val b = bits.select(col("w").as(s"__bw$i"), col("word").as(s"__bword$i"))
      df
        .withColumn(s"__bpos$i", bitPos(col(factKey), i, mBits))
        .join(broadcast(b), shiftright(col(s"__bpos$i"), 6) === col(s"__bw$i"))
        // bit p of word, via arithmetic shift + mask (sign fill cannot
        // reach the masked lowest bit)
        .filter(expr(
          s"(shiftright(__bword$i, cast(__bpos$i & 63 as int)) & 1) = 1"))
        .drop(s"__bpos$i", s"__bw$i", s"__bword$i")
    }

  /** Bloom-accelerated left-semi join: prefilter the fact side, then
    * the exact semi-join on the survivors. Result rows are identical
    * to `fact.join(dim, keys, "left_semi")` — the Bloom stage only
    * removes guaranteed non-matches ahead of the shuffle. */
  def semiJoin(fact: DataFrame, factKey: String,
               dim: DataFrame, dimKey: String,
               mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    // materialize the word table once — it feeds k separate broadcast
    // joins, and without the cut the dim-side build aggregation would
    // re-execute per probe (the table is ≤ mBits/64 rows, so the
    // materialization is metadata-sized). Lazy: this code also runs
    // inside the analyzer (the BloomSemiNode expansion rule), where an
    // eager job would stall plan construction.
    val bits = buildBits(dim.select(col(dimKey)).distinct(), dimKey, mBits, k)
      .localCheckpoint(eager = false)
    prefilter(fact, factKey, bits, mBits, k)
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
