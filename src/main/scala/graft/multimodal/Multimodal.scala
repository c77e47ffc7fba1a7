package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/
  * video as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operator shapes a
  * training-data pipeline needs.
  *
  * The Spark-side plumbing — schemas, partitioning, the
  * `mapPartitions` batch shape, row fan-out — is real and tested. The
  * codec itself is a clearly-marked STUB (`fakeDecode`): this
  * container has no image/audio libraries, so decode produces a
  * deterministic feature digest of the bytes. Swapping in a real codec
  * changes only the function body, not the distributed shape: the
  * partition iterator is exactly where a JNI/FFmpeg/ImageIO call would
  * batch.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, n_frames: Int)

  case class MediaRow(media_id: Long, kind: String,
      content: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      checksum: String, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic media corpus synthesized from the documents table —
    * text bytes stand in for encoded payloads so every pipeline stage
    * is testable without codecs. */
  def synthesizeCorpus(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        lit("synthetic").as("format"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 30 + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** STUB — deterministic fake decode. A real implementation would
    * decode `bytes` with an image/audio library here; the container
    * ships none, so this derives an 8-dim feature vector from byte
    * statistics. Deterministic in the input bytes. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out.map(v => v / bytes.length * 8)
  }

  /** Decode + feature extraction over partition-sized batches. Each
    * partition iterator is the real batch boundary — a production
    * codec would initialize once per partition (the `mapPartitions`
    * shape) and stream rows through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point: real codecs would open here
      rows.map { r =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.content.length, digest,
          fakeDecode(r.content))
      }
    }
  }

  /** STUB resize — metadata-only transform (a real implementation
    * would transcode `content`); the plumbing (schema evolution,
    * null-safety) is real. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format"),
      lit(width).as("width"), lit(height).as("height"),
      col("meta.channels"), col("meta.sample_rate"),
      col("meta.n_frames")))

  /** Frame sampling: fan each video row out to every `stride`-th frame
    * index — the row-explosion shape of real frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))
}
