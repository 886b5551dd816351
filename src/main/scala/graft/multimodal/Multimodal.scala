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

  /** REAL pure-JVM image header probe — no codec dependency: PNG IHDR
    * (PNG spec / RFC 2083 §11.2.2: 8-byte signature, IHDR width/height
    * big-endian at offsets 16/20) and JPEG SOF (ITU T.81 §B.2.2: walk the
    * marker segments to the first start-of-frame; height at +5, width at
    * +7). Returns `(format, width, height)`, or None for anything
    * truncated, corrupt, or not an image — callers fall back to the
    * deterministic stub, so a poison payload can never fail the pipeline.
    *
    * Deliberately LIMITED to formats whose magic bytes cannot occur in
    * text (PNG's 0x89 prefix and JPEG's 0xFF D8 are invalid UTF-8 text
    * starts): an ASCII-magic format like GIF ("GIF89a...") is
    * indistinguishable from a document DISCUSSING that format, and a
    * false positive here would silently replace stub metadata with
    * text-derived garbage. Extend per-format only for columns known to
    * carry trusted binary payloads.
    */
  def probeImage(p: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length >= 24 && PngSig.indices.forall(i => u8(i) == PngSig(i)) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val (w, h) = (be32(16), be32(20))
      if (w > 0 && h > 0) Some(("png", w, h)) else None
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG marker segments to the first SOFn (C0–CF minus the
      // non-frame C4/C8/CC); bail on anything malformed
      var i = 2
      while (i + 1 < p.length) {
        if (u8(i) != 0xff) return None
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
        else if (i + 3 >= p.length) return None
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 >= p.length) return None
            val (h, w) = (be16(i + 5), be16(i + 7))
            return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
          }
          i += 2 + segLen
        }
      }
      None
    } else None
  }

  /** Minimal well-formed-enough PNG/JPEG headers for planting known
    * dimensions in tests and oracle queries (the payloads carry a real
    * header + junk body — [[probeImage]] only reads the header, exactly
    * like a production prober that avoids a full decode).
    */
  private[graft] def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private[graft] def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 6 + 10)
    b.put(0xff.toByte).put(0xd8.toByte)               // SOI
    b.put(0xff.toByte).put(0xdb.toByte).putShort(4)   // DQT segment to skip
    b.putShort(0.toShort)
    b.put(0xff.toByte).put(0xc0.toByte).putShort(17)  // SOF0
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    b.array()
  }

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

  /** REAL-first decode: parse the actual image header when the payload is
    * a recognizable PNG/JPEG/GIF (still image → n_frames = 1), fall back
    * to the deterministic stub otherwise — corrupt or unknown payloads
    * degrade to fake-but-stable metadata instead of failing the batch.
    */
  def decodeMeta(id: Long, kind: String, payload: Array[Byte]): MediaMeta =
    probeImage(payload) match {
      case Some((fmt, w, h)) =>
        MediaMeta(id, kind, payload.length.toLong, w, h, 1, fmt)
      case None => decodeStub(id, kind, payload)
    }

  /** Decode a media Dataset partition-wise. One decoder per partition: the
    * MessageDigest here stands in for a codec context that is expensive to
    * open and must not be per-row.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init goes here (header probe needs none)
      rows.map(r => decodeMeta(r.media_id, r.kind, r.payload))
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
    val meta = decodeMeta(id, kind, payload)
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

  /** [[syntheticMedia]] with REAL image headers planted on a deterministic
    * subset: media_id % 4 == 0 gets a PNG, % 4 == 1 a JPEG, each with
    * dimensions derived from the id (so an oracle can assert the probe
    * recovered them without parsing anything itself); the rest keep the
    * text payload and exercise the stub fallback.
    */
  def plantedMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    syntheticMedia(spark, docs).map { r =>
      (r.media_id % 4) match {
        case 0 => r.copy(payload = pngBytes(
          16 + (r.media_id % 1024).toInt, 16 + ((7 * r.media_id) % 1024).toInt))
        case 1 => r.copy(payload = jpegBytes(
          16 + ((3 * r.media_id) % 2048).toInt,
          16 + ((5 * r.media_id) % 2048).toInt))
        case _ => r
      }
    }
  }
}
