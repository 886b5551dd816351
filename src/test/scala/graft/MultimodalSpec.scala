package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("decodeStub is deterministic and byte-derived") {
    val a = Multimodal.decodeStub(1L, "image", "hello".getBytes("UTF-8"))
    val b = Multimodal.decodeStub(1L, "image", "hello".getBytes("UTF-8"))
    assert(a == b)
    assert(a.n_bytes == 5)
    assert(a.width >= 16 && a.width < 16 + 1024)
    assert(a.height >= 16 && a.height < 16 + 1024)
    assert(Seq("jpeg", "png", "webp").contains(a.format))
    val c = Multimodal.decodeStub(1L, "image", "other".getBytes("UTF-8"))
    assert((a.width, a.height) != (c.width, c.height))
  }

  test("partition-wise decode keeps ids aligned and schema typed") {
    val docs = Seq((0L, "aaa"), (1L, "bbbb"), (2L, "c"))
      .toDF("doc_id", "text")
    val meta = Multimodal.mediaMetadata(spark, docs)
    assert(meta.schema.fieldNames.toSeq == Seq(
      "media_id", "kind", "n_bytes", "width", "height", "n_frames", "format"))
    val rows = meta.orderBy("media_id")
      .select("media_id", "kind", "n_bytes")
      .as[(Long, String, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_._2).toSeq == Seq("image", "audio", "video"))
    assert(rows.map(_._3).toSeq == Seq(3L, 4L, 1L))
  }

  test("probeImage parses real PNG/JPEG/GIF headers and rejects garbage") {
    assert(Multimodal.probeImage(Multimodal.pngBytes(640, 480))
      .contains(("png", 640, 480)))
    assert(Multimodal.probeImage(Multimodal.jpegBytes(1920, 1080))
      .contains(("jpeg", 1920, 1080)))
    // ASCII-magic formats are deliberately NOT probed: a text doc that
    // merely starts with a GIF header string must hit the stub, never be
    // misread as an image (the false-positive class the probe excludes)
    val gifText = "GIF89a is an image format from 1989".getBytes("UTF-8")
    assert(Multimodal.probeImage(gifText).isEmpty)
    // rejects: truncated PNG (cut before IHDR dims), JPEG with no SOF,
    // zero-dim PNG, plain text, empty
    assert(Multimodal.probeImage(Multimodal.pngBytes(640, 480).take(20)).isEmpty)
    assert(Multimodal.probeImage(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xdb.toByte, 0x00, 0x04, 0x00, 0x00)).isEmpty)
    assert(Multimodal.probeImage(Multimodal.pngBytes(0, 480)).isEmpty)
    assert(Multimodal.probeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.probeImage(Array.empty[Byte]).isEmpty)
    // a JPEG whose SOF is cut off mid-segment is rejected, not misread
    assert(Multimodal.probeImage(Multimodal.jpegBytes(1920, 1080).take(13)).isEmpty)
  }

  test("decodeMeta: real header wins, corrupt/unknown falls back to stub") {
    val real = Multimodal.decodeMeta(7L, "image", Multimodal.pngBytes(99, 77))
    assert((real.format, real.width, real.height, real.n_frames) ==
      (("png", 99, 77, 1)))
    // fallback must be EXACTLY the stub (oracle reproducibility)
    val junk = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeMeta(7L, "image", junk) ==
      Multimodal.decodeStub(7L, "image", junk))
    val truncated = Multimodal.pngBytes(99, 77).take(12)
    assert(Multimodal.decodeMeta(7L, "image", truncated) ==
      Multimodal.decodeStub(7L, "image", truncated))
    // planted end-to-end through the partition-wise decode
    val docs = Seq((0L, "px"), (1L, "jy"), (2L, "tz"), (3L, "tw"))
      .toDF("doc_id", "text")
    val got = Multimodal.decode(Multimodal.plantedMedia(spark, docs)).toDF()
      .select("media_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, "png", 16, 16)))       // id 0: w=16+0, h=16+0
    assert(got(1L) == ((1L, "jpeg", 19, 21)))      // id 1: w=16+3, h=16+5
    assert(Seq("jpeg", "png", "webp").contains(got(2L)._2)) // stub fallback
  }
}
