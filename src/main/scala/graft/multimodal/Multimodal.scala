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
