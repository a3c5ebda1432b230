package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata structs. The Spark-side machinery — schema,
 * batched per-partition processing, partition sizing — is real and tested;
 * the actual codec step is STUBBED (no image/audio libraries in this
 * container) behind [[decodeImageStub]], a deterministic fake that a real
 * deployment swaps for JavaCV/TwelveMonkeys or a Python `mapInPandas`
 * stage without touching any surrounding plumbing.
 *
 * Scale notes: binary payloads dominate partition size, so callers should
 * size `spark.sql.files.maxPartitionBytes` to the media, not the metadata;
 * feature extraction is mapPartitions-batched (one decoder instance per
 * partition, the broadcast-model pattern again — src/prod.py:14-15 analog).
 */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
      n_bytes: Long)
  final case class MediaFeature(media_id: Long, meta: MediaMeta,
      histogram: Array[Double])

  /**
   * STUB decoder ??? replacement: a real implementation would decode the
   * image here. This fake derives (format, width, height) deterministically
   * from the payload header bytes so tests exercise real plumbing.
   */
  def decodeImageStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.isEmpty) return MediaMeta("empty", 0, 0, 0L)
    val w = 64 + (java.lang.Byte.toUnsignedInt(bytes(0)) % 64) * 16
    val h = 64 + (java.lang.Byte.toUnsignedInt(
      bytes(math.min(1, bytes.length - 1))) % 64) * 16
    val fmt = (bytes(0) & 3) match {
      case 0 => "jpeg"; case 1 => "png"; case 2 => "webp"; case _ => "bin"
    }
    MediaMeta(fmt, w, h, bytes.length.toLong)
  }

  /** 16-bucket byte histogram (the stand-in "feature extraction"; a real
    * pipeline would emit an embedding). Pure, allocation-light. */
  def byteHistogram(bytes: Array[Byte], buckets: Int = 16): Array[Double] = {
    val hist = new Array[Double](buckets)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist(java.lang.Byte.toUnsignedInt(bytes(i)) * buckets / 256) += 1.0
      i += 1
    }
    hist.map(_ / bytes.length)
  }

  /** media(media_id bigint, payload binary) -> features. Batched
    * mapPartitions: decoder state initialized once per partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts, models)
        it.map { case (id, payload) =>
          MediaFeature(id, decodeImageStub(payload), byteHistogram(payload))
        }
      }
  }

  /** Demo media table synthesized from any text table: payload =
    * UTF-8 bytes standing in for an image blob (deterministic). */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Frame-sampling plumbing for "video": split payload into fixed-size
    * frames, keep every `stride`-th — the schema/batching pattern of real
    * frame extraction. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    media.select(col("media_id"),
      posexplode(split(base64(col("payload")), s"(?<=\\G.{$frameBytes})")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_b64")
      .where(pmod(col("frame_idx"), lit(stride)) === 0)
}
