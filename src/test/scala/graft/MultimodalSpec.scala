package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions.col

/** G1–G3 — multimodal plumbing with the deterministic stub decoder. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic and batched per partition") {
    val media = Multimodal.syntheticMedia(spark, 30).repartition(3)
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.length == 30)
    // byte-stable: same payload -> same features on a re-run
    val again = Multimodal.extractFeatures(media, Multimodal.StubDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.toSeq == again.toSeq)
    // videos fan out frames; images are single-frame
    assert(feats.filter(_.kind == "video").forall(_.n_frames >= 1))
    assert(feats.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(feats.forall(f => f.mean_luma >= 0 && f.mean_luma <= 255))
  }

  test("perceptual-hash LSH finds exact-dup media and skips unrelated") {
    import spark.implicits._
    // two media with IDENTICAL payloads (3 and 103) + unrelated rest
    val base = Multimodal.syntheticMedia(spark, 12)
    val dup = base.filter(col("media_id") === 3L)
      .select((col("media_id") + 100L).as("media_id"), col("kind"), col("payload"))
    val hashed = Multimodal.perceptualHash(base.union(dup), Multimodal.StubDecoder)
    val pairs = Multimodal.phashDups(hashed, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((3L, 103L, 0L)), s"exact dup missed: ${pairs.toSeq}")
    // candidate generation is banded, never all-pairs: spot-check that
    // an unrelated pair with distant hashes is absent
    val h = hashed.collect().map(m => m.media_id -> m.phash).toMap
    for ((a, b, _) <- pairs) assert(
      java.lang.Long.bitCount(h(a) ^ h(b)) <= 4)
  }

  test("G5: video run-dup finds shared frame runs, not scattered singles") {
    import spark.implicits._
    // Hand-built frame hashes (no decode): videos A=1,B=2,C=3 with 8
    // frames each. B's frames 3..7 replay A's frames 0..4 (one clean
    // run); C shares ONE isolated frame with A (hash 100 at C idx 6) —
    // below shingle length, so C must not pair with anyone.
    def hashes(v: Long, f: Long => Long) =
      (0L until 8L).map(i => (v, i, f(i)))
    val a = hashes(1L, i => 100L + i)            // 100..107
    val b = hashes(2L, i => if (i >= 3) 100L + (i - 3) else 900L + i)
    val c = hashes(3L, i => if (i == 6) 100L else 700L + i)
    val frames = (a ++ b ++ c).toDF("media_id", "frame_idx", "phash")
    val out = Multimodal.videoRunDups(frames, shingleLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // A↔B: shared shingles at A idx 0,1,2 (frames 0..4 = B 3..7), one
    // run, longest 3+2 = 5 frames. No other pair.
    assert(out.toSeq == Seq((1L, 2L, 3L, 5L, 1L)), out.toSeq.toString)
  }

  test("G5: two disjoint shared runs stay two runs (diagonal islands)") {
    import spark.implicits._
    // B replays A's frames 0..2 at 0..2 (same diagonal 0) AND A's
    // frames 5..7 at 5..7 — same diagonal, but a gap at 3..4 splits
    // them into TWO islands of one shingle each.
    val a = (0L until 8L).map(i => (1L, i, 10L + i))
    val b = (0L until 8L).map(i =>
      (2L, i, if (i <= 2 || i >= 5) 10L + i else 500L + i))
    val out = Multimodal.videoRunDups((a ++ b).toDF("media_id", "frame_idx", "phash"),
      shingleLen = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 3L, 2L)), out.toSeq.toString)
  }

  test("G6 audio alignment: planted remasters win with full votes at delta 0") {
    val audio = Multimodal.syntheticAudio(spark, 60)
    val dups = Multimodal.audioAlignDups(
      Multimodal.audioFingerprints(audio, Multimodal.StubDecoder).toDF())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // every planted (base, base+3) remaster pair aligns at delta 0
    val planted = (3 until 60 by 4).map(i => (i - 3).toLong -> i.toLong)
    planted.foreach { p =>
      val (delta, votes) = dups.getOrElse(p, fail(s"planted pair $p not found"))
      assert(delta == 0L, s"pair $p best delta $delta")
      // the shared 30-sample prefix carries 9 windows; the first two
      // ride corpus-common regions (the "audio-track-" intro and any
      // sign-pattern coincidences), whose hub
      // fingerprints the df-cap correctly drops (the silence-intro
      // behavior) — a clear majority of discriminative votes remains
      assert(votes >= 5L, s"pair $p only $votes votes")
    }
    // genuinely dissimilar tracks (different lengths → different
    // sample streams end to end) never reach the vote floor. The OTHER
    // high-vote pairs the histogram reports are single-byte payload
    // siblings whose stub sample streams differ by a constant ±8
    // (Δacc = 8·31^k, and 8·(±1 mod 32) mod 256 ∈ {8,248}) — near-
    // identical signals the fingerprint CORRECTLY matches; a real
    // decoder has no such linear structure.
    for (p <- Seq((0L, 30L), (1L, 20L), (2L, 50L), (5L, 45L), (6L, 22L)))
      assert(!dups.contains(p), s"dissimilar pair $p reported: ${dups.get(p)}")
  }

  test("frame sampling explodes stride-spaced frame indices") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecoder)
    val sampled = Multimodal.sampleFrames(feats, stride = 2)
    val byId = sampled.collect().groupBy(_.getLong(0))
    val f = feats.collect()
    f.foreach { m =>
      val expected = (0 until m.n_frames by 2).toSet
      assert(byId(m.media_id).map(_.getInt(2)).toSet == expected)
    }
  }
}
