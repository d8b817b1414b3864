package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SCD2 (slowly-changing-dimension type 2) maintenance, the Spark-native
  * re-expression of the reference's terminal-history pipeline
  * (data_to_db.py:145-271): detect new / deleted / changed rows between
  * the current dimension view and an incoming snapshot, close the
  * affected versions, and append the replacements (tombstones carry
  * `deleted_flg = 1`).
  *
  * Unlike the reference's in-place sqlite UPDATEs, this is pure
  * DataFrame algebra — rewrite-the-partition semantics, which is what an
  * immutable data lake at 100 TB needs. Every detect is a key-join the
  * planner can broadcast when the snapshot is small; the merge is
  * union-of-joins with a single shuffle on the business key.
  *
  * Effective-time columns are caller-supplied batch labels (strings),
  * not wall-clock `current_timestamp` — deterministic replays beat the
  * reference's now()-based versioning at scale.
  */
object Scd2 {

  val HighDate = "2999-12-31"

  /** Rows in `snapshot` whose key is absent from `current`
    * (data_to_db.py:171-180 STG_NEW_TERMINALS). */
  def detectNew(current: DataFrame, snapshot: DataFrame, key: String): DataFrame =
    snapshot.join(current, Seq(key), "left_anti")

  /** Rows in `current` whose key is absent from `snapshot`
    * (data_to_db.py:183-192 STG_DELETED_TERMINALS). */
  def detectDeleted(current: DataFrame, snapshot: DataFrame, key: String): DataFrame =
    current.join(snapshot, Seq(key), "left_anti")

  /** Snapshot rows whose key exists in `current` but with any attribute
    * changed (data_to_db.py:195-206 STG_CHANGED_TERMINALS). */
  def detectChanged(current: DataFrame, snapshot: DataFrame,
                    key: String, attrs: Seq[String]): DataFrame = {
    val n = snapshot.alias("n")
    val o = current.alias("o")
    val anyDiff: Column = attrs
      .map(a => col(s"n.$a") =!= col(s"o.$a"))
      .reduce(_ || _)
    n.join(o, col(s"n.$key") === col(s"o.$key"))
      .filter(anyDiff)
      .select((key +: attrs).map(c => col(s"n.$c")): _*)
  }

  /** Seed a history table from a first snapshot. */
  def init(snapshot: DataFrame, batchDate: String): DataFrame =
    snapshot
      .withColumn("effective_from", lit(batchDate))
      .withColumn("effective_to", lit(HighDate))
      .withColumn("deleted_flg", lit(0L))

  /** Merge `snapshot` (labeled `batchDate`) into `history`
    * (data_to_db.py:209-271 update_terminals_hist): close open versions
    * of changed/deleted keys, append changed+new rows, append deleted
    * tombstones.
    */
  def merge(history: DataFrame, snapshot: DataFrame, key: String,
            attrs: Seq[String], batchDate: String): DataFrame = {
    val cols = key +: attrs
    val current = history
      .filter(col("deleted_flg") === 0L && col("effective_to") === HighDate)
      .select(cols.map(col): _*)
      // three consumers (the new/deleted/changed detects) — un-cut,
      // each re-derived the history scan + open-version filter.
      // Current-dimension-sized.
      .localCheckpoint(true)

    val newRows = detectNew(current, snapshot, key)
    val deletedRows = detectDeleted(current, snapshot, key)
    val changedRows = detectChanged(current, snapshot, key, attrs)

    val touchedKeys = changedRows.select(col(key))
      .unionByName(deletedRows.select(col(key)))
      // three consumers (close semi, untouched anti + semi) — un-cut,
      // each re-ran the changed+deleted detect joins. Key-only rows.
      .localCheckpoint(true)

    // Close the open version of every touched key (reference's UPDATE …
    // SET effective_to = now()-1s, re-expressed as a column rewrite).
    val closed = history
      .join(touchedKeys, Seq(key), "left_semi")
      .filter(col("effective_to") === HighDate)
      .withColumn("effective_to", lit(batchDate))
    val untouched = history
      .join(touchedKeys, Seq(key), "left_anti")
      .unionByName(history
        .join(touchedKeys, Seq(key), "left_semi")
        .filter(col("effective_to") =!= HighDate))

    val inserts = newRows.unionByName(changedRows)
      .withColumn("effective_from", lit(batchDate))
      .withColumn("effective_to", lit(HighDate))
      .withColumn("deleted_flg", lit(0L))
      .unionByName(deletedRows
        .withColumn("effective_from", lit(batchDate))
        .withColumn("effective_to", lit(HighDate))
        .withColumn("deleted_flg", lit(1L)))

    untouched.unionByName(closed).unionByName(inserts)
  }

  /** The reference's STG_V_TERMINALS current view (data_to_db.py:158-168):
    * open, non-deleted versions only. */
  def currentView(history: DataFrame): DataFrame =
    history.filter(col("deleted_flg") === 0L && col("effective_to") === HighDate)

  /** B10 — point-in-time (temporal) fact-to-dimension join: each fact
    * row resolves the dimension version whose effective window covers
    * its date — the historically-correct read the reference's
    * current-view joins approximate. Windows are half-open [from, to)
    * (a closed version's effective_to equals its successor's
    * effective_from, so no date matches two versions); tombstoned
    * spans leave the fact unmatched (left join keeps it, attrs null).
    *
    * Scale: an equi-join on the dimension key — the range predicate
    * rides the join as a filter since versions-per-key is tiny — with
    * the dimension side broadcast (dimension history ≪ facts; drop the
    * hint if a dimension ever outgrows broadcast and the same plan
    * shuffles on the key). Dates are ISO strings, so lexicographic
    * comparison IS date comparison.
    */
  def pointInTimeJoin(facts: DataFrame, factKey: String, factDate: String,
                      history: DataFrame, key: String): DataFrame = {
    val h = history.filter(col("deleted_flg") === 0L)
      .withColumnRenamed(key, "__dim_key")
    facts.join(broadcast(h),
      col(factKey) === col("__dim_key") &&
        col(factDate) >= col("effective_from") &&
        col(factDate) < col("effective_to"),
      "left")
      .drop("__dim_key")
  }

  /** B30 — SCD2 history SQUASH (history hygiene): merge runs of
    * ADJACENT versions that carry identical (attrs, deleted_flg) and
    * abut exactly (prev.effective_to == effective_from) into one
    * span. Real histories accumulate such runs from flip-flopping
    * feeds, replayed loaders and over-eager span splits; they bloat
    * the dimension and slow every point-in-time join without changing
    * any answer — squash is the OPTIMIZE of the SCD2 world. Islands
    * via the D70 idiom: a running count of is-new-island markers per
    * key (one window pass), then one (key, island) aggregation taking
    * min(from)/max(to). Non-abutting identical spans and flag changes
    * never merge (a tombstone between identical spans breaks the run
    * by both tests). Point-in-time semantics are provably unchanged:
    * [[splitSpans]] ∘ squash is the identity on any well-formed
    * history — the q_scd2_squash oracle IS that round trip. */
  def squash(history: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("effective_from"), col("deleted_flg"))
    val sameAsPrev = (attrs.map(a => col(a) <=> lag(col(a), 1).over(w)) :+
      (col("deleted_flg") <=> lag(col("deleted_flg"), 1).over(w)) :+
      (col("effective_from") <=> lag(col("effective_to"), 1).over(w)))
      .reduce(_ && _)
    history
      .withColumn("__new_island", when(sameAsPrev, 0L).otherwise(1L))
      .withColumn("__island", sum(col("__new_island")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy((col(key) +: col("__island") +: attrs.map(col)) :+ col("deleted_flg"): _*)
      .agg(min(col("effective_from")).as("effective_from"),
        max(col("effective_to")).as("effective_to"))
      .select(history.columns.map(col): _*)
  }

  /** The inverse dirtier (test/demo): split every span ≥2 days at its
    * midpoint into two identical abutting versions — the redundant
    * history squash must collapse back byte-identically. */
  def splitSpans(history: DataFrame): DataFrame = {
    val f = to_date(col("effective_from"))
    val t = to_date(col("effective_to"))
    val mid = date_format(
      date_add(f, (datediff(t, f) / 2).cast("int")), "yyyy-MM-dd")
    val two = array(
      struct(col("effective_from").as("ef"), mid.as("et")),
      struct(mid.as("ef"), col("effective_to").as("et")))
    val one = array(struct(col("effective_from").as("ef"),
      col("effective_to").as("et")))
    history
      .withColumn("__p", explode(when(datediff(t, f) >= 2, two).otherwise(one)))
      .withColumn("effective_from", col("__p.ef"))
      .withColumn("effective_to", col("__p.et"))
      .select(history.columns.map(col): _*)
  }

  /** CDC changelog derived from an SCD2 history: one (op, key, attrs)
    * row per change — 'I' for first versions, 'U' for reopened versions
    * of an existing key (new attribute values), 'D' for tombstones. The
    * downstream view a streaming consumer of the dimension would want.
    */
  def changelog(history: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("effective_from"), col("deleted_flg"))
    val outCols = Seq(col("op"), col(key).as("key")) ++ attrs.map(col) :+
      col("effective_from").as("change_dt")
    // Every version row introduced exactly one state change at its
    // effective_from: the first version is the insert, later non-deleted
    // versions are updates, tombstones are deletes.
    history
      .withColumn("version_n", row_number().over(w))
      .withColumn("op",
        when(col("deleted_flg") === 1L, lit("D"))
          .when(col("version_n") === 1, lit("I"))
          .otherwise(lit("U")))
      .select(outCols: _*)
  }
}
