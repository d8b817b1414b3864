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
    * for every record whose id ≡ 0 (mod `queryMod`). */
  def fuzzyLookup(records: DataFrame, idCol: String, nameCol: String,
                  queryMod: Long = 199, maxDist: Int = 2, k: Int = 5)
      : DataFrame = {
    val recs = withBlock(records.select(col(idCol).as("rid"),
      col(nameCol).as("name")), "name")
    val qs = recs.filter(col("rid") % queryMod === 0)
      .select(col("rid").as("q_id"), col("name").as("q_name"), col("blk"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("rid"))
    qs.join(recs, Seq("blk"))
      .filter(col("q_id") =!= col("rid"))
      .withColumn("dist",
        levenshtein(col("q_name"), col("name"), maxDist).cast(LongType))
      .filter(col("dist") >= 0)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rid").as("match_id"), col("dist"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
