package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed aggregations and joins (SURVEY.md §6).
  *
  * A groupBy on a key whose top value owns 30% of a 100 TB fact sends
  * 30 TB through one reducer. Salting splits each hot key into
  * `nSalts` sub-keys for a first local-ish aggregation, then combines
  * the partials — the classic two-level rollup, kept deterministic by
  * deriving the salt from a hash of stable carrier columns rather than
  * rand().
  */
object Salting {

  def salt(carrier: Column, nSalts: Int): Column =
    pmod(hash(carrier), lit(nSalts))

  /** Two-level salted sum/count aggregation of `valueCol` by `key`.
    * Result is identical to the direct groupBy (sums are associative);
    * the first level fans the hot key across `nSalts` reducers. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                carrier: String, nSalts: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(col(carrier), nSalts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))

  /** Skew-safe equi-join: the fact side gets a carrier-derived salt, the
    * (small) dim side is replicated across all `nSalts` sub-keys, and
    * the join runs on (key, salt) — a hot fact key now spreads over
    * `nSalts` reducers instead of melting one. Result-identical to the
    * plain join. (AQE's skew-join split handles this adaptively;
    * explicit salting is for engines/pipelines where it can't.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 carrier: String, nSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(col(carrier), nSalts))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
