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
}
