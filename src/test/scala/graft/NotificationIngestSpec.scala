package graft

import org.apache.spark.sql.functions._

import graft.ingest.{Ingest, NotificationIngest}
import graft.model.Manifest

/** Notification-driven trigger mode: decode → glob match → ledger →
  * load, with no bucket listing anywhere (O(new files) discovery).
  */
class NotificationIngestSpec extends SparkSpec {

  import spark.implicits._

  private val manifestJson =
    """{
      "project": "t",
      "tasks": [{
        "sources": ["**/in/**/*.csv"],
        "dataset": "ds",
        "table": "sensors",
        "fields": [
          {"name": "timestamp",  "type": "timestamp"},
          {"name": "utc_offset", "type": "float"},
          {"name": "location",   "type": "string"}
        ]
      },
      {
        "sources": ["**/elsewhere/*.csv"],
        "dataset": "ds",
        "table": "other",
        "fields": [{"name": "timestamp", "type": "timestamp"}]
      }]
    }"""

  private def notif(et: String, kind: String, bucket: String, name: String,
      seq: Long): (String, String, Long) = {
    val json = s"""{"kind":"$kind","selfLink":"$bucket/$name",""" +
      s""""bucket":"$bucket","name":"$name"}"""
    (et, json, seq)
  }

  test("notification-driven load: decode, dedup, glob match, ledger, " +
      "replay safety — no listing") {
    val root = tmpDir("notif_")
    val src = new java.io.File(s"$root/in"); src.mkdirs()
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.write(body) finally w.close()
    }
    write("a.csv",
      "timestamp,utc_offset,location\n" +
        "2026-01-01 00:00:00,1.0,x\n2026-01-02 00:00:00,1.0,y\n")
    write("b.csv",
      "timestamp,utc_offset,location\n2026-01-03 00:00:00,2.0,z\n")
    write("c.txt", "not a csv\n")

    val tasks = Manifest.parse(manifestJson).tasks
    val task = tasks.head
    val bucket = s"$root/in"
    def notifications(rows: Seq[(String, String, Long)]) =
      rows.toDF("eventType", "json", "seq")
        .withColumn("data", base64(col("json").cast("binary")))

    // batch 1: a.csv finalized TWICE (dup notification), b.csv only
    // metadata-updated, c.txt finalized (no glob match), plus a non-object
    // payload — only a.csv must load
    val batch1 = notifications(Seq(
      notif("OBJECT_FINALIZE", "storage#object", bucket, "a.csv", 1L),
      notif("OBJECT_FINALIZE", "storage#object", bucket, "a.csv", 2L),
      notif("OBJECT_METADATA_UPDATE", "storage#object", bucket, "b.csv", 3L),
      notif("OBJECT_FINALIZE", "storage#object", bucket, "c.txt", 4L),
      notif("OBJECT_FINALIZE", "storage#notAnObject", bucket, "x.csv", 5L)))

    // only the matching task triggers (reference getTriggeredTaskInfos)
    val triggered = NotificationIngest.triggeredTasks(
      batch1, tasks, orderCols = Seq(col("seq")), scheme = "file://")
    assert(triggered.map(_.table) == Seq("sensors"))

    val r1 = NotificationIngest.loadNotified(spark, task, batch1,
      s"$root/wh", orderCols = Seq(col("seq")), scheme = "file://")
    assert(r1.loadedFiles == Seq(s"file://$bucket/a.csv"))
    assert(r1.rows == 2)
    assert(r1.partitionField.contains("timestamp"))

    // batch 2: a.csv re-notified (ledger must drop it) + b.csv finalized
    val batch2 = notifications(Seq(
      notif("OBJECT_FINALIZE", "storage#object", bucket, "a.csv", 6L),
      notif("OBJECT_FINALIZE", "storage#object", bucket, "b.csv", 7L)))
    val r2 = NotificationIngest.loadNotified(spark, task, batch2,
      s"$root/wh", orderCols = Seq(col("seq")), scheme = "file://")
    assert(r2.loadedFiles == Seq(s"file://$bucket/b.csv"))
    assert(Ingest.readDest(spark, r2.destPath).count() == 3)

    // empty batch → clean no-op
    val r3 = NotificationIngest.loadNotified(spark, task,
      notifications(Nil), s"$root/wh",
      orderCols = Seq(col("seq")), scheme = "file://")
    assert(r3.loadedFiles.isEmpty && r3.rows == 0)
  }

  test("STREAMING notification ingest: drop-directory topic, AvailableNow " +
      "drain, ledger dedup across restarts") {
    val root = tmpDir("notifstream_")
    val src = new java.io.File(s"$root/in"); src.mkdirs()
    val topic = new java.io.File(s"$root/topic"); topic.mkdirs()
    def writeCsv(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.write(body) finally w.close()
    }
    writeCsv("a.csv",
      "timestamp,utc_offset,location\n2026-01-01 00:00:00,1.0,x\n")
    writeCsv("b.csv",
      "timestamp,utc_offset,location\n2026-01-02 00:00:00,1.0,y\n")
    val bucket = s"$root/in"
    def publish(file: String, names: Seq[(String, Long)]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(topic, file))
      try names.foreach { case (n, seq) =>
        val json = s"""{"kind":"storage#object","selfLink":"$bucket/$n",""" +
          s""""bucket":"$bucket","name":"$n"}"""
        val b64 = java.util.Base64.getEncoder
          .encodeToString(json.getBytes("UTF-8"))
        w.println(
          s"""{"eventType":"OBJECT_FINALIZE","data":"$b64","seq":$seq}""")
      } finally w.close()
    }
    val task = Manifest.parse(manifestJson).tasks.head

    publish("batch1.json", Seq(("a.csv", 1L)))
    graft.streaming.StreamingIngest.startNotified(spark, task,
      topic.getAbsolutePath, s"$root/wh", s"$root/ckpt", scheme = "file://")
      .awaitTermination()
    assert(Ingest.readDest(spark, s"$root/wh/ds/sensors").count() == 1)

    // second drop: a.csv re-notified (ledger drops it) + b.csv new;
    // FRESH checkpoint to prove the ledger alone dedups across restarts
    publish("batch2.json", Seq(("a.csv", 2L), ("b.csv", 3L)))
    graft.streaming.StreamingIngest.startNotified(spark, task,
      topic.getAbsolutePath, s"$root/wh", s"$root/ckpt2", scheme = "file://")
      .awaitTermination()
    assert(Ingest.readDest(spark, s"$root/wh/ds/sensors").count() == 2)
  }
}
