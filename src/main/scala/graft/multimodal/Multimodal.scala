package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 G): image/audio/video travel
  * as opaque `binary` payloads beside typed metadata; decode and
  * feature-extraction run batched per partition behind a [[MediaDecoder]].
  *
  * The container ships no codec libraries, so [[StubDecoder]] fakes the
  * decode deterministically from the payload bytes — the Spark-side
  * contract (schema, partitioning, batch shape, feature columns) is the
  * real thing and is what the tests pin down. In production the stub is
  * swapped for a JNI/FFmpeg-backed decoder with the same trait.
  *
  * Scale posture: payloads never pass through a shuffle — features are
  * extracted map-side and only the (tiny) feature vectors move on.
  */
object Multimodal {

  /** The lake schema for a media table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = false),  // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           luma: Array[Double])

  /** Boundary for the native decode step (the `???` of this container). */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): Decoded
  }

  /** Deterministic fake: "pixels" are a rolling transform of the payload
    * bytes; dimensions derive from payload length. Replays byte-stable. */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): Decoded = {
      val w = 4 + (payload.length % 8)
      val h = 3 + (payload.length % 5)
      val frames = if (kind == "video") 1 + payload.length % 7 else 1
      val luma = new Array[Double](w * h)
      var acc = 17L
      var i = 0
      while (i < luma.length) {
        acc = (acc * 31 + payload(i % payload.length)) & 0xffffffffL
        luma(i) = (acc % 256).toDouble
        i += 1
      }
      Decoded(w, h, frames, luma)
    }
  }

  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, n_frames: Int, mean_luma: Double,
                                 max_luma: Double)

  /** G2 — batched per-partition decode + feature extraction. One decoder
    * instance per partition (native decoders are expensive to init), rows
    * streamed through it. */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val d = decoder.decode(kind, payload)
          val mean = if (d.luma.isEmpty) 0d else d.luma.sum / d.luma.length
          val max = if (d.luma.isEmpty) 0d else d.luma.max
          MediaFeatures(id, kind, d.width, d.height, d.nFrames, mean, max)
        }
      }
  }

  /** G3 — frame sampling plumbing: every `stride`-th frame index up to
    * `nFrames`, as (media_id, frame_idx) pairs ready for a per-frame
    * decode fan-out. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .select(col("media_id"), col("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  final case class MediaHashed(media_id: Long, kind: String, phash: Long)

  /** G4 — 64-bit perceptual hash (classic aHash): each bit compares one
    * luma cell against the frame's mean. Computed inside the same
    * per-partition decode pass as the features — the payload is decoded
    * once and never shuffled; only (id, kind, 8-byte hash) moves on. */
  def perceptualHash(media: DataFrame, decoder: MediaDecoder): Dataset[MediaHashed] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val d = decoder.decode(kind, payload)
          val mean =
            if (d.luma.isEmpty) 0d else d.luma.sum / d.luma.length
          var h = 0L
          var i = 0
          while (i < 64 && d.luma.nonEmpty) {
            if (d.luma(i % d.luma.length) > mean) h |= (1L << i)
            i += 1
          }
          MediaHashed(id, kind, h)
        }
      }
  }

  /** G4 — near-duplicate media via banded perceptual-hash LSH: the
    * 64-bit hash splits into four 16-bit bands; any shared band makes a
    * candidate pair, verified by exact Hamming distance
    * (`bit_count(xor)`). Same bucket-join shape as the text MinHash
    * pipeline ([[graft.ops.Dedup.minhashLsh]]) — candidates are bounded
    * by bucket sizes, never all-pairs, and only 8-byte hashes shuffle.
    * A pair within `maxHamming` in ANY band is reported once. */
  def phashDups(hashed: Dataset[MediaHashed], maxHamming: Int = 8): DataFrame = {
    val banded = hashed.toDF()
      .select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band"),
            (shiftright(col("phash"), i * 16) bitwiseAND lit(0xffffL))
              .as("bv"))): _*)).as("b"))
      .select(col("media_id"), col("phash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"),
      col("media_id").as("id1"), col("phash").as("h1"))
    val b = banded.select(col("band"), col("bv"),
      col("media_id").as("id2"), col("phash").as("h2"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast(LongType)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  final case class FrameHashed(media_id: Long, frame_idx: Long, phash: Long)

  /** G5 — per-FRAME perceptual hashing, the fan-out step G3's sampler
    * feeds: each (video, frame) payload decodes once inside the same
    * per-partition discipline as [[perceptualHash]] and only the
    * (video_id, frame_idx, 8-byte hash) triple moves on. In production
    * the payload column is the frame image the video decoder emitted;
    * the stub keeps the byte-deterministic contract. */
  def framePhashes(frames: DataFrame, decoder: MediaDecoder): Dataset[FrameHashed] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("media_id"), col("frame_idx"), col("payload"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, idx, payload) =>
          val d = decoder.decode("image", payload)
          val mean = if (d.luma.isEmpty) 0d else d.luma.sum / d.luma.length
          var h = 0L
          var i = 0
          while (i < 64 && d.luma.nonEmpty) {
            if (d.luma(i % d.luma.length) > mean) h |= (1L << i)
            i += 1
          }
          FrameHashed(id, idx, h)
        }
      }
  }

  /** G5 — temporal frame-sequence near-dup: which video PAIRS share a
    * RUN of consecutive matching frames (a re-upload, a clip, a
    * re-encode with intro/outro edits) — per-frame pHash equality alone
    * (G4) can't tell a shared still from a shared sequence.
    *
    * Shape: the E55/D59 shingling discipline on the frame-hash STREAM —
    * every `shingleLen` consecutive frame hashes collapse to one md5
    * shingle signature; equal signatures across videos are the banded
    * candidates (bucket-join on the signature, never all-pairs); and
    * shared shingles on the same alignment DIAGONAL (i1 − i2) with
    * consecutive indices are one run (the D70 gaps-and-islands
    * contraction). Output per pair: total shared shingles, the longest
    * run in frames, and the number of distinct runs.
    *
    * Scale: shingle volume = frame volume (one row per frame minus
    * edge effects); candidates are signature-bucket-bounded like every
    * LSH path in ops/Dedup; runs contract candidates to
    * (pair, diagonal) groups. Only 8-byte hashes and md5 strings
    * shuffle — frame payloads never leave the decode stage. */
  def videoRunDups(framesHashed: DataFrame, shingleLen: Int = 3): DataFrame = {
    require(shingleLen >= 2, "shingleLen must be at least 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val leadCols = (1 until shingleLen).map(i => s"__h$i")
    val withLeads = (1 until shingleLen).foldLeft(framesHashed) { (df, i) =>
      df.withColumn(s"__h$i", lead(col("phash"), i).over(w))
    }
    val sh = withLeads
      .filter(leadCols.map(col(_).isNotNull).reduce(_ && _)) // full shingles only
      .select(col("media_id"), col("frame_idx").as("sidx"),
        md5(concat_ws(":",
          (col("phash") +: leadCols.map(col)).map(_.cast(StringType)): _*))
          .as("sig"))
    val a = sh.select(col("sig"), col("media_id").as("vid1"),
      col("sidx").as("i1"))
    val b = sh.select(col("sig"), col("media_id").as("vid2"),
      col("sidx").as("i2"))
    val shared = a.join(b, Seq("sig"))
      .filter(col("vid1") < col("vid2"))
      .select(col("vid1"), col("vid2"), col("i1"), col("i2"),
        (col("i1") - col("i2")).as("diag"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vid1"), col("vid2"), col("diag"))
      .orderBy(col("i1"))
    val runs = shared
      .withColumn("grp", col("i1") - row_number().over(wr))
      .groupBy(col("vid1"), col("vid2"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("n_shingles"))
    runs.groupBy(col("vid1"), col("vid2"))
      .agg(sum(col("n_shingles")).as("n_shared_shingles"),
        (max(col("n_shingles")) + (shingleLen - 1).toLong)
          .as("longest_run_frames"),
        count(lit(1)).as("n_runs"))
      .orderBy(col("vid1"), col("vid2"))
  }

  /** Deterministic synthetic frame payloads for [[framePhashes]] in
    * this codec-less container: the payload models WHAT THE VIDEO
    * DECODER WOULD EMIT for each sampled frame, so two videos that
    * share upstream content share frame bytes. Videos with
    * `media_id % 5 == 4` are synthetic re-uploads: from frame 2 on
    * they replay video (id−4)'s frames 0,1,2,… — a shared run with a
    * 2-frame edited intro, the exact shape [[videoRunDups]] exists to
    * catch. */
  def syntheticFramePayloads(frames: DataFrame): DataFrame =
    frames.withColumn("content",
      when(col("media_id") % 5 === 4 && col("frame_idx") >= 2,
        concat_ws(":", (col("media_id") - 4).cast(StringType),
          (col("frame_idx") - 2).cast(StringType)))
        .otherwise(concat_ws(":", col("media_id").cast(StringType),
          col("frame_idx").cast(StringType))))
      .withColumn("payload",
        encode(concat(lit("frame-"), col("content")), "UTF-8"))
      .drop("content")

  /** Deterministic synthetic VIDEO corpus: payload lengths are padded
    * so the stub decode yields 7 frames for every video (≡ 6 mod 7),
    * with residual length variation so luma dims still differ. The
    * re-upload content sharing lives in [[syntheticFramePayloads]]. */
  def syntheticVideos(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = s"media-$i-video"
      val pad = (6 - base.length % 7 + 7) % 7 + 7 * (i % 3)
      (i.toLong, "video",
        (base + "x" * pad).getBytes(StandardCharsets.UTF_8))
    }.toDF("media_id", "kind", "payload")
  }

  final case class AudioPrint(media_id: Long, win_idx: Long, fhash: Long)

  /** G6 — audio FINGERPRINTS: the Shazam/chromaprint idea on the stub
    * sample stream. A real decoder yields a waveform; the public
    * fingerprint recipe is landmark bits from COMPARISONS between
    * adjacent band energies per time window (comparisons survive gain
    * and codec changes where absolute energies don't). Here each
    * sliding window of `winLen` samples emits a (winLen−1)-bit hash of
    * successive-sample comparisons — computed inside the per-partition
    * decode pass (G2's discipline: payloads never shuffle, only
    * (id, window, hash) rows move on). */
  def audioFingerprints(media: DataFrame, decoder: MediaDecoder,
                        winLen: Int = 13, hop: Int = 2): Dataset[AudioPrint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, kind, payload) =>
          val d = decoder.decode(kind, payload)
          val n = d.luma.length
          (0 to n - winLen by hop).map { w =>
            var h = 0L
            var b = 0
            while (b < winLen - 1) {
              if (d.luma(w + b + 1) > d.luma(w + b)) h |= (1L << b)
              b += 1
            }
            AudioPrint(id, w.toLong, h)
          }
        }
      }
  }

  /** G6 — audio near-dup via the ALIGNMENT HISTOGRAM (the landmark
    * pairing step of every audio-ID system): candidate window pairs
    * join on equal fingerprints (hub hashes df-capped first — a
    * silence-grade print matching half the corpus is the posting-skew
    * hotspot, same cure as E47), then votes accumulate per
    * (pair, offset delta): a real re-master concentrates its matches
    * on ONE delta while chance collisions scatter. Reports each pair's
    * best alignment with its vote count at `minMatches`+. */
  def audioAlignDups(prints: DataFrame, minMatches: Long = 3L,
                     maxDfMedia: Long = 10L): DataFrame = {
    val hubFree = prints.join(
      prints.groupBy(col("fhash"))
        .agg(countDistinct(col("media_id")).as("nm"))
        .filter(col("nm") <= maxDfMedia)
        .select(col("fhash")),
      Seq("fhash"), "left_semi")
    val votes = hubFree.select(col("fhash"), col("media_id").as("id1"),
        col("win_idx").as("w1"))
      .join(hubFree.select(col("fhash"), col("media_id").as("id2"),
        col("win_idx").as("w2")), Seq("fhash"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), (col("w1") - col("w2")).as("delta"))
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id1"), col("id2"))
      .orderBy(col("n_matches").desc, col("delta"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id1"), col("id2"), col("delta").as("best_delta"),
        col("n_matches"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Deterministic synthetic AUDIO corpus with re-master structure:
    * every 4th track is a COPY of an earlier one sharing its payload
    * prefix (the stub's rolling decode makes shared prefixes yield
    * shared leading samples — the analog of "same program, different
    * tail"). */
  def syntheticAudio(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val payload =
        if (i % 4 == 3) s"audio-track-${i - 3}-program-material-remaster-v2"
        else s"audio-track-$i-program-material"
      (i.toLong, "audio", payload.getBytes(StandardCharsets.UTF_8))
    }.toDF("media_id", "kind", "payload")
  }

  /** Deterministic synthetic media table built from any keyed source —
    * lets the plumbing run in a container with no real media files. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = s"media-$i-${kind}-payload".getBytes(StandardCharsets.UTF_8)
      (i.toLong, kind, payload)
    }.toDF("media_id", "kind", "payload")
  }
}
