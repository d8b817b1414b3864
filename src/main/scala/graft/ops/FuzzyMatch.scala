package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Blocked fuzzy matching / entity resolution (SURVEY.md §2 E27):
  * candidate pairs from a cheap blocking key, verified by edit distance.
  *
  * All-pairs Levenshtein over n records is O(n²) and unshippable; a
  * blocking key turns it into Σ O(|block|²) — and on a corpus whose
  * names repeat heavily (like this synthetic vocabulary) even the
  * matched-pair OUTPUT goes quadratic. The shippable shape is therefore
  * the fuzzy LOOKUP: a bounded query set joined to its blocks, top-k
  * nearest names per query. Cost is |queries|·|block|, output ≤ k per
  * query, and the block key is the scale lever (here first token + first
  * character of the second token; compound further as blocks grow).
  *
  * Spark evaluates the codegen'd threshold form `levenshtein(a, b, max)`
  * which early-exits once the running distance exceeds `max` (returns
  * −1), so each verify is O(len·max) not O(len²). The per-query top-k
  * pushes down as WindowGroupLimit.
  */
object FuzzyMatch {

  private def withBlock(df: DataFrame, nameCol: String): DataFrame = {
    val toks = split(col(nameCol), " ")
    df.withColumn("blk",
      concat_ws("|", toks.getItem(0), substring(toks.getItem(1), 1, 1)))
  }

  /** Top-`k` fuzzy matches (edit distance ≤ `maxDist`, self excluded)
    * for every record whose id ≡ 0 (mod `queryMod`).
    *
    * I14 contraction: edit distance is a function of the NAME PAIR, so
    * Levenshtein runs once per distinct (query-name, candidate-name)
    * pair — on a corpus whose names repeat (this vocabulary, every
    * replica corpus, any real customer table) the verify cost drops by
    * the duplication factor squared. Record pairs expand through
    * name-membership joins AFTER an exact distance-level cut: a record
    * whose name has ≥ k+1 records at strictly smaller distances can
    * never reach the top k (self-exclusion removes at most one), so
    * only O(k + tie mass) rows per query reach the rank window. */
  def fuzzyLookup(records: DataFrame, idCol: String, nameCol: String,
                  queryMod: Long = 199, maxDist: Int = 2, k: Int = 5)
      : DataFrame =
    lookupCore(records, idCol, nameCol, queryMod, k,
      (a, b) => levenshtein(a, b, maxDist).cast(LongType))

  /** E65 — the same blocked lookup under UNRESTRICTED Damerau–
    * Levenshtein (the native codegen'd [[graft.functions.DamerauL]],
    * I26): a transposed digit pair or swapped character is ONE error —
    * the typo class fraud identity fields actually carry (passport
    * numbers, names keyed by hand) that plain Levenshtein bills as
    * two and pushes past the threshold. Same blocking, same two exact
    * contractions, same −1-past-max kernel contract; only the metric
    * changes, so any DL-vs-L difference in the mart is attributable
    * to transpositions alone. */
  def fuzzyLookupDL(records: DataFrame, idCol: String, nameCol: String,
                    queryMod: Long = 199, maxDist: Int = 2, k: Int = 5)
      : DataFrame =
    lookupCore(records, idCol, nameCol, queryMod, k,
      (a, b) => graft.functions.DamerauL(a, b, maxDist))

  private def lookupCore(records: DataFrame, idCol: String, nameCol: String,
                         queryMod: Long, k: Int,
                         dist: (org.apache.spark.sql.Column,
                           org.apache.spark.sql.Column) =>
                           org.apache.spark.sql.Column): DataFrame = {
    val recs = records.select(col(idCol).as("rid"), col(nameCol).as("name"))
    val names = withBlock(
      recs.groupBy(col("name")).agg(count(lit(1)).as("gsz")), "name")
    val qIds = recs.filter(col("rid") % queryMod === 0)
      .select(col("rid").as("q_id"), col("name").as("q_name"))
    val qNames = qIds.select(col("q_name")).distinct()
      .join(names.select(col("name").as("q_name"), col("blk")), Seq("q_name"))
    val pairDist = qNames.join(names, Seq("blk"))
      .withColumn("dist", dist(col("q_name"), col("name")))
      .filter(col("dist") >= 0)
      .select(col("q_name"), col("name"), col("dist"), col("gsz"))
    val byDist = pairDist.groupBy(col("q_name"), col("dist"))
      .agg(sum(col("gsz")).as("msz"))
    val wD = Window.partitionBy(col("q_name")).orderBy(col("dist"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = byDist
      .withColumn("lower", coalesce(sum(col("msz")).over(wD), lit(0L)))
      .filter(col("lower") < k + 1)
      .select(col("q_name"), col("dist"))
    val candPairs = pairDist.join(cut, Seq("q_name", "dist"))
    // Second exact contraction, WITHIN each surviving name: the final
    // rank orders by (dist, rid) and dist is a name-pair function, so
    // of a candidate name's records only the k+1 smallest rids can
    // reach ANY query's top k (self-exclusion removes at most one).
    // Without this, a heavily-duplicated name expands to its whole
    // record group per query — |queries|·|group| is replication-
    // QUADRATIC (measured: 127 s at the 100× replica, where every
    // name holds ~31k records). The rn ≤ k+1 filter plans as
    // WindowGroupLimit, so the per-name top cut runs map-side.
    val wName = Window.partitionBy(col("name")).orderBy(col("rid"))
    val candRecs = recs
      .join(candPairs.select(col("name")).distinct(), Seq("name"), "left_semi")
      .withColumn("nrn", row_number().over(wName))
      .filter(col("nrn") <= k + 1)
      .drop("nrn")
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("rid"))
    qIds
      .join(candPairs, Seq("q_name"))
      .join(candRecs, Seq("name"))
      .filter(col("q_id") =!= col("rid"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rid").as("match_id"), col("dist"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
