package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.GraftFunctions.h32

/** B13 — bucket-checksum table reconciliation (anti-entropy): find
  * WHERE two huge snapshots differ without ever joining them row-by-
  * row. Each side folds into `buckets` (bucket, row-count, XOR of
  * 32-bit row hashes) summaries — map-side combined, so the exchange
  * carries O(buckets) rows per side regardless of table size — and the
  * summaries full-outer join on bucket. Equal buckets vanish; the
  * survivors are the drill-down set for a targeted per-bucket row diff
  * (run the same operator keyed inside one bucket, Merkle-style).
  * XOR is the right checksum here: order-insensitive, associative,
  * and any single-row change flips it (collisions need a SECOND
  * differing row hashing to the same 32 bits within one bucket —
  * count catches cardinality drift regardless).
  */
object TableDiff {

  def diff(left: DataFrame, right: DataFrame, key: String,
           cols: Seq[String], buckets: Int = 256): DataFrame = {
    def summarize(df: DataFrame): DataFrame = df
      .select((col(key) % buckets).cast(LongType).as("bucket"),
        h32(concat_ws("|", (key +: cols).map(col): _*)).as("rh"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("cs"))
    val l = summarize(left)
      .select(col("bucket"), col("n").as("n_left"), col("cs").as("xor_left"))
    val r = summarize(right)
      .select(col("bucket"), col("n").as("n_right"), col("cs").as("xor_right"))
    l.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        coalesce(col("xor_left"), lit(0L)).as("xor_left"),
        coalesce(col("xor_right"), lit(0L)).as("xor_right"))
      .filter(col("n_left") =!= col("n_right") ||
        col("xor_left") =!= col("xor_right"))
      .orderBy(col("bucket"))
  }
}
