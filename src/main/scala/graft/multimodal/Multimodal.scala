package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque `binary`
  * columns with typed metadata extracted by a per-partition decode pass.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic fake metadata from
  * the payload's md5, so the pipeline is fully testable and
  * oracle-reproducible. The Spark-side plumbing is real and is the part
  * that matters at 100 TB:
  *  - payloads stay in `binary` columns end-to-end (no stringification);
  *  - decode runs via `mapPartitions` over a typed Dataset — one decoder
  *    instance per partition (the expensive codec init is amortized across
  *    the whole batch, the exact shape a JNI/FFmpeg/Pillow bridge needs);
  *  - output is a typed case class → clean columnar schema for downstream
  *    relational ops.
  */
object Multimodal {

  /** A media row: id + opaque payload + declared kind. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Typed decode result — what a real image/audio prober would emit. */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  private val Formats = Array("jpeg", "png", "webp")

  /** STUB decoder: deterministic fake metadata from the payload bytes.
    * A real deployment swaps this body for the codec call; the signature
    * (bytes in, typed meta out) and the partition-wise driver below are the
    * production shape.
    */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val w = 16 + (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1024L)
    val h = 16 + (java.lang.Long.parseLong(hex.substring(8, 15), 16) % 1024L)
    val f = Formats(Integer.parseInt(hex.substring(31, 32), 16) % Formats.length)
    MediaMeta(id, kind, payload.length.toLong, w.toInt, h.toInt,
      1 + (payload.length % 30), f)
  }

  /** Decode a media Dataset partition-wise. One decoder per partition: the
    * MessageDigest here stands in for a codec context that is expensive to
    * open and must not be per-row.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init goes here (STUB: nothing to open)
      rows.map(r => decodeStub(r.media_id, r.kind, r.payload))
    }
  }

  /** Full feature row: decode metadata + derived transforms, all from one
    * pass over the payload (decode once, derive everything — the shape a
    * real codec pipeline wants, since opening the media is the expensive
    * part).
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      out_w: Int,        // resize-to-fit-256 stub
      out_h: Int,
      n_frames: Int,
      frame_ids: String, // 4 evenly-spaced sampled frame indices, csv
      feature: Array[Double]) // 8-dim fake embedding from payload md5

  /** STUB feature extraction: resize dims, frame sampling, and an 8-dim
    * "embedding" — all deterministic arithmetic over the md5/byte-length,
    * so the whole pipeline is oracle-reproducible. A real deployment
    * replaces the bodies with codec/model calls; signatures and the
    * partition-wise driver stay.
    */
  def extractStub(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    val meta = decodeStub(id, kind, payload)
    val scale = 256.0 / math.max(meta.width, meta.height)
    val outW = math.max(1, math.floor(meta.width * scale).toInt)
    val outH = math.max(1, math.floor(meta.height * scale).toInt)
    val frames = (0 until 4).map(j => (j * meta.n_frames) / 4).distinct
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val feature = Array.tabulate(8) { d =>
      java.lang.Long.parseLong(hex.substring(4 * d, 4 * d + 4), 16)
        .toDouble / 65536.0 * 2.0 - 1.0
    }
    MediaFeatures(id, kind, meta.width, meta.height, outW, outH,
      meta.n_frames, frames.mkString(","), feature)
  }

  /** Partition-wise feature extraction (same batching rationale as
    * [[decode]]).
    */
  def extract(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => extractStub(r.media_id, r.kind, r.payload))
    }
  }

  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    extract(syntheticMedia(spark, docs)).toDF()

  /** Build a synthetic media table from the documents table: the UTF-8
    * bytes of the text as payload (a stand-in for image bytes), kind
    * round-robins over media types. Keeps everything deterministic.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** End-to-end: documents → synthetic binary payloads → partition-wise
    * stub decode → typed metadata frame.
    */
  def mediaMetadata(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(syntheticMedia(spark, docs)).toDF()
}
