package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Staging→DWH projection/rename, the reference's INSERT…SELECT column
  * remapping (data_to_db.py:31-83, 96-114). Pure projection — Catalyst
  * prunes the scan to exactly the mapped columns.
  */
object ColumnMapping {
  /** Project the mapped columns out of `staging`, renamed, in the given
    * order (a Seq, not a Map — output column order must be stable). */
  def apply(staging: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    staging.select(mapping.map { case (from, to) =>
      col(from).as(to)
    }: _*)
}
