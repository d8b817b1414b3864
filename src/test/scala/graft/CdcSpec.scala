package graft

import graft.etl.Cdc

/** CDC op-log apply semantics (B23): tombstones, resurrection,
  * out-of-order and duplicate delivery. The oracle twin proves
  * Spark↔DuckDB parity on the synthesized log; these pin the fold. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("k", "lsn", "op", "price_cents")

  test("B23: trailing tombstone removes the key; I-after-D resurrects it") {
    val out = Cdc.applyLog(log(Seq(
      (1L, 1L, "I", 100L), (1L, 2L, "U", 150L), (1L, 3L, "D", 0L),
      (2L, 1L, "I", 200L), (2L, 2L, "D", 0L), (2L, 3L, "I", 250L))))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains(1L), "key 1 ends on a tombstone and must vanish")
    assert(out(2L) == (3L, 3L, 1L, 250L),
      "key 2's insert-after-delete must resurrect with the new payload")
  }

  test("B23: lsn order beats arrival order; duplicate delivery is harmless") {
    // key 3 arrives newest-first; key 4's insert is delivered twice
    val out = Cdc.applyLog(log(Seq(
      (3L, 5L, "U", 330L), (3L, 1L, "I", 300L),
      (4L, 1L, "I", 400L), (4L, 1L, "I", 400L))))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(3L) == (5L, 2L, 330L), "lsn 5 wins regardless of arrival")
    assert(out(4L) == (1L, 2L, 400L), "redelivered op folds to one row")
  }

  test("B23: the fold is invariant to arrival order and partitioning") {
    // a generated op log applied in four different physical layouts
    // must produce identical snapshots — the at-least-once transport
    // guarantees NOTHING about order, so the operator must
    val rnd = new scala.util.Random(11)
    val ops = (0 until 400).map { i =>
      val k = (i % 37).toLong
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "D"; case 2 => "I"; case _ => "U"
      }
      (k, i.toLong, op, rnd.nextInt(100000).toLong)
    }
    def snap(rows: Seq[(Long, Long, String, Long)], parts: Int) =
      Cdc.applyLog(rows.toDF("k", "lsn", "op", "price_cents")
        .repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val base = snap(ops, 4)
    assert(base == snap(rnd.shuffle(ops), 1))
    assert(base == snap(ops.reverse, 13))
    assert(base == snap(rnd.shuffle(ops), 32))
  }

  test("B23: payload columns pass through generically") {
    val out = Cdc.applyLog(
      Seq((9L, 1L, "I", 10L, "x", 7.5)).toDF("k", "lsn", "op", "a", "b", "c"))
    assert(out.columns.toSeq ==
      Seq("k", "applied_lsn", "n_ops", "n_deletes", "a", "b", "c"))
    val r = out.collect().head
    assert(r.getLong(4) == 10L && r.getString(5) == "x" && r.getDouble(6) == 7.5)
  }
}
