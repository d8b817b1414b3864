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
