package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B23 — CDC (change-data-capture) op-log apply: fold a Debezium-style
  * operation log (key, lsn, op ∈ {I,U,D}, payload) into the table
  * snapshot it describes. The semantics CDC consumers actually need —
  * and that a naive "take the latest row" gets wrong:
  *
  *  - ORDER is the log sequence number, not arrival: the fold sorts
  *    per key by (lsn, op) so out-of-order and duplicate deliveries
  *    (at-least-once transports re-send) land deterministically;
  *  - a DELETE is a TOMBSTONE, not row removal from the log: the key
  *    disappears from the snapshot only if the tombstone is the LAST
  *    op; an insert AFTER a delete resurrects the key (the I-after-D
  *    case every CDC pipeline must survive);
  *  - per-key lineage is kept auditable: op counts and the applied
  *    lsn frontier ride along, so a consumer can assert exactly-once
  *    application against the transport's redelivery count.
  *
  * Scale: ONE key-partitioned window pass (rank by lsn desc) over the
  * log + the filter — no join, no collect; the op log shuffles once on
  * its key, exactly like the SCD2 family (B2–B6) it complements:
  * SCD2 keeps every version with effective windows, CDC apply
  * materializes only the live frontier. Ties on lsn (a transport
  * retry that re-sends the same lsn) break deterministically by op
  * then payload hash — replayed identically by the DuckDB twin. */
object Cdc {

  def applyLog(log: DataFrame, key: String = "k", lsn: String = "lsn",
               op: String = "op"): DataFrame = {
    val payload = log.columns.filterNot(Seq(key, lsn, op).contains)
    val w = Window.partitionBy(col(key))
      .orderBy(col(lsn).desc, col(op).desc,
        md5(concat_ws("", payload.map(col): _*)).desc)
    val wk = Window.partitionBy(col(key))
    log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(wk))
      .withColumn("n_deletes",
        sum(when(col(op) === "D", 1L).otherwise(0L)).over(wk))
      .filter(col("rn") === 1)
      .filter(col(op) =!= "D")
      .select((col(key) +: col(lsn).as("applied_lsn") +:
        col("n_ops") +: col("n_deletes") +: payload.map(col)): _*)
      .orderBy(col(key))
  }
}
