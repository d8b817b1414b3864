package graft

import graft.multimodal.Multimodal

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
