package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{FraudHit, Txn}

/** F1–F3 — structured-streaming operators driven synchronously through
  * MemoryStream + processAllAvailable. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // Base offset of 10 h: rows AT the current watermark are dropped as
  // late by stateful operators, and the initial watermark is epoch 0 —
  // so minute-0 events must not sit exactly at the epoch.
  private def us(minutes: Long): Long = (600L + minutes) * 60000000L

  test("F2: stateful amount-guessing pattern fires on decreasing rejects") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Txn]
    val q = StreamingOps.guessingAmountStream(in.toDS(), maxMinutes = 20)
      .writeStream.format("memory").queryName("hits").outputMode("append").start()
    try {
      in.addData(
        Txn(7L, us(0), 5000L, "REJECT"),
        Txn(7L, us(2), 4000L, "REJECT"),
        Txn(7L, us(4), 3000L, "REJECT"),
        Txn(7L, us(6), 2500L, "SUCCESS"),  // pattern complete -> hit
        Txn(8L, us(0), 5000L, "REJECT"),
        Txn(8L, us(2), 6000L, "REJECT"),   // not decreasing
        Txn(8L, us(4), 3000L, "REJECT"),
        Txn(8L, us(6), 2500L, "SUCCESS"))
      q.processAllAvailable()
      val hits = spark.table("hits").as[FraudHit].collect()
      assert(hits.toSeq == Seq(FraudHit(7L, us(6), 2500L)))

      // state carries across batches: user 9 rejects in batch 1...
      in.addData(
        Txn(9L, us(10), 9000L, "REJECT"),
        Txn(9L, us(11), 8000L, "REJECT"),
        Txn(9L, us(12), 7000L, "REJECT"))
      q.processAllAvailable()
      // ...success in batch 2 still completes the pattern
      in.addData(Txn(9L, us(13), 1000L, "SUCCESS"))
      q.processAllAvailable()
      val hits2 = spark.table("hits").as[FraudHit].collect()
      assert(hits2.exists(_.user_id == 9L) && hits2.length == 2)
    } finally q.stop()
  }

  test("F2: keyed state expires once the watermark passes the pattern TTL") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Txn]
    val q = StreamingOps.guessingAmountStream(in.toDS(), maxMinutes = 20)
      .writeStream.format("memory").queryName("ttlhits").outputMode("append").start()
    try {
      // user 11: a complete decreasing-REJECT prefix...
      in.addData(
        Txn(11L, us(0), 5000L, "REJECT"),
        Txn(11L, us(1), 4000L, "REJECT"),
        Txn(11L, us(2), 3000L, "REJECT"))
      q.processAllAvailable()
      // ...then the watermark races 2 h ahead (TTL = 22 min), and the
      // following batch evicts user 11's state on timeout
      in.addData(Txn(99L, us(120), 1L, "REJECT"))
      q.processAllAvailable()
      in.addData(Txn(99L, us(121), 1L, "REJECT"))
      q.processAllAvailable()
      // a SUCCESS that WOULD have completed the pattern (3 min gap) no
      // longer fires: the state was expired, not just out-of-window
      in.addData(Txn(11L, us(3), 1000L, "SUCCESS"))
      q.processAllAvailable()
      val hits = spark.table("ttlhits").as[FraudHit].collect()
      assert(!hits.exists(_.user_id == 11L),
        s"state should have expired before the late SUCCESS; got ${hits.toSeq}")
    } finally q.stop()
  }

  test("F1: watermarked windowed aggregation over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts_t", "event_type", "value")
    val q = StreamingOps.windowedEventCounts(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 00:10:00"), "purchase", 10.0),
        (Timestamp.valueOf("2024-01-01 00:40:00"), "purchase", 5.5),
        (Timestamp.valueOf("2024-01-01 01:10:00"), "error", 1.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .select(col("event_type"), col("n"), col("sum_cents")).collect()
      assert(rows.exists(r => r.getString(0) == "purchase" &&
        r.getLong(1) == 2L && r.getLong(2) == 1550L))
      assert(rows.exists(r => r.getString(0) == "error" && r.getLong(1) == 1L))
    } finally q.stop()
  }

  test("F5: streaming near-dedup drops minhash-band duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts_t", "doc_id", "text")
    val q = StreamingOps.streamingNearDedup(docs, "1 hour")
      .writeStream.format("memory").queryName("neardedup").outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      in.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, base),
        (Timestamp.valueOf("2024-01-01 00:01:00"), 2L, base),      // exact dup
        (Timestamp.valueOf("2024-01-01 00:02:00"), 3L,
          "completely different text about spark window functions and joins"))
      q.processAllAvailable()
      val ids = spark.table("neardedup").select("doc_id").as[Long].collect().sorted
      assert(ids.length == 2 && ids.contains(3L) && !ids.contains(2L))
    } finally q.stop()
  }

  test("F7: streaming embedding near-dedup drops same-signature vectors") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Array[Float])]
    val vecs = in.toDF().toDF("ts_t", "vec_id", "embedding")
    val q = StreamingOps.streamingEmbedDedup(vecs, "1 hour")
      .writeStream.format("memory").queryName("embdedup").outputMode("append").start()
    try {
      val rnd = new scala.util.Random(3)
      val a = Array.fill(64)(rnd.nextFloat())
      val aEps = a.clone(); aEps(0) = a(0) + 1e-6f // near-identical: same buckets
      val b = Array.fill(64)(rnd.nextFloat())      // unrelated vector
      in.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, a),
        (Timestamp.valueOf("2024-01-01 00:01:00"), 2L, aEps),
        (Timestamp.valueOf("2024-01-01 00:02:00"), 3L, b))
      q.processAllAvailable()
      val ids = spark.table("embdedup").select("vec_id").as[Long].collect().sorted
      assert(ids.contains(1L) && ids.contains(3L) && !ids.contains(2L),
        s"expected near-dup 2 dropped, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("F11: streaming as-of resolves out-of-order refs once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{AsOfEvent, AsOfHit}
    def ev(m: Long, ref: Boolean, uid: Long = 1L) =
      AsOfEvent(uid, us(m), ref, new Timestamp(us(m) / 1000L))
    val in = MemoryStream[AsOfEvent]
    val q = StreamingOps.streamingAsOf(in.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: the QUERY (t=20) arrives before its best ref
      in.addData(ev(20, ref = false), ev(5, ref = true))
      q.processAllAvailable()
      assert(spark.table("asof").isEmpty) // wm hasn't passed t=20 yet
      // batch 2: a LATE ref (t=15, inside the delay) + wm advance to ~25
      in.addData(ev(15, ref = true), ev(35, ref = true))
      q.processAllAvailable()
      // batch 3: push the watermark past t=20 to finalize the query
      in.addData(ev(40, ref = true, uid = 2L))
      q.processAllAvailable()
      val hits = spark.table("asof").as[AsOfHit].collect().toSeq
      // the late t=15 ref — not the t=5 one seen first — must win
      assert(hits == Seq(AsOfHit(1L, us(20), us(15), us(20) - us(15))))
      // unmatched query: user 2 has a ref at 40 but queries at 38
      in.addData(ev(38, ref = false, uid = 2L))
      in.addData(ev(60, ref = true)) // advance wm past 38
      q.processAllAvailable()
      val hits2 = spark.table("asof").as[AsOfHit].collect().toSeq
      assert(hits2.contains(AsOfHit(2L, us(38), -1L, -1L)))
    } finally q.stop()
  }

  test("F8: stream-stream interval join matches errors within the gap only") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Timestamp, Long, Long)]
    val eIn = MemoryStream[(Timestamp, Long)]
    val purchases = pIn.toDF().toDF("ts_t", "user_id", "amt_cents")
    val errors = eIn.toDF().toDF("ts_t", "user_id")
    val q = StreamingOps.purchaseErrorJoin(purchases, errors,
      watermark = "30 minutes", maxGapMinutes = 10)
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      eIn.addData(
        (Timestamp.valueOf("2024-01-01 09:55:00"), 1L),  // in gap
        (Timestamp.valueOf("2024-01-01 09:30:00"), 1L),  // too early
        (Timestamp.valueOf("2024-01-01 09:58:00"), 2L))  // other user
      pIn.addData((Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 500L))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select(col("user_id"), col("e_ts")).collect()
      assert(rows.length == 1)
      assert(rows(0).getLong(0) == 1L)
      assert(rows(0).getTimestamp(1) == Timestamp.valueOf("2024-01-01 09:55:00"))
    } finally q.stop()
  }

  test("F20: left-outer interval join emits the clean purchase only after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Timestamp, Long, Long)]
    val eIn = MemoryStream[(Timestamp, Long)]
    val purchases = pIn.toDF().toDF("ts_t", "user_id", "amt_cents")
    val errors = eIn.toDF().toDF("ts_t", "user_id")
    val q = StreamingOps.purchaseErrorJoinOuter(purchases, errors,
      watermark = "10 minutes", maxGapMinutes = 10)
      .writeStream.format("memory").queryName("ssouter").outputMode("append").start()
    try {
      // user 1 purchase has a matching error; user 3's is clean
      eIn.addData((Timestamp.valueOf("2024-01-01 09:55:00"), 1L))
      pIn.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 500L),
        (Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 700L))
      q.processAllAvailable()
      val matched = spark.table("ssouter")
        .select(col("user_id"), col("e_ts")).collect()
      // the clean purchase must NOT emit yet — an error could still arrive
      assert(matched.map(_.getLong(0)).toSet == Set(1L))
      // advance BOTH watermarks past the end of user 3's match window
      eIn.addData((Timestamp.valueOf("2024-01-01 10:45:00"), 9L))
      pIn.addData((Timestamp.valueOf("2024-01-01 10:45:00"), 9L, 1L))
      q.processAllAvailable()
      eIn.addData((Timestamp.valueOf("2024-01-01 11:20:00"), 9L))
      pIn.addData((Timestamp.valueOf("2024-01-01 11:20:00"), 9L, 1L))
      q.processAllAvailable()
      val rows = spark.table("ssouter")
        .select(col("user_id"), col("e_ts")).collect()
      val clean = rows.filter(_.getLong(0) == 3L)
      assert(clean.length == 1 && clean(0).isNullAt(1),
        s"expected one null-extended row for user 3, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("F9: stream-static enrichment joins the batch dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long)]
    val txns = in.toDF().toDF("ts_t", "user_id", "amt_cents")
    val clients = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "segment")
    val q = StreamingOps.enrichStream(txns, clients)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 100L),
        (Timestamp.valueOf("2024-01-01 10:01:00"), 9L, 200L))  // no dim row
      q.processAllAvailable()
      val out = spark.table("enrich")
        .select(col("user_id"), col("segment")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(out == Map(1L -> Some("GOLD"), 9L -> None))
    } finally q.stop()
  }

  test("F10: session windows merge within the gap and split across it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long)]
    val events = in.toDF().toDF("ts_t", "user_id", "amt_cents")
    val q = StreamingOps.sessionizedCounts(events, gap = "30 minutes",
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 10L),
        (Timestamp.valueOf("2024-01-01 10:20:00"), 1L, 20L),   // same session
        (Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 40L),   // new session
        (Timestamp.valueOf("2024-01-01 10:05:00"), 2L, 5L))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("sum_cents")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 2L, 30L), (1L, 1L, 40L), (2L, 1L, 5L)))
    } finally q.stop()
  }

  test("F3: streaming dedup drops exact duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val docs = in.toDF().toDF("ts_t", "text")
    val q = StreamingOps.streamingDedup(docs, "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "alpha"),
        (Timestamp.valueOf("2024-01-01 00:01:00"), "alpha"),
        (Timestamp.valueOf("2024-01-01 00:02:00"), "beta"))
      q.processAllAvailable()
      val texts = spark.table("dedup").select("text").as[String].collect().sorted
      assert(texts.toSeq == Seq("alpha", "beta"))
    } finally q.stop()
  }
}
