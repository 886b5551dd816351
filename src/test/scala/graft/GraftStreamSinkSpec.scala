package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.ManifestSink
import graft.sources.GraftStreamSink

/** The native streaming SINK: `writeStream.format("graft")` — every
  * micro-batch one atomic manifest commit, exactly-once across
  * restarts (deterministic writeId over the idempotent commit
  * protocol), optional per-batch upsert via `mergeKey`.
  */
class GraftStreamSinkSpec extends SparkSpec {

  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("append sink: batches commit atomically with stats; restart " +
      "from the same checkpoint neither drops nor duplicates") {
    val dest = s"${tmpDir("gsink_app_")}/t"
    val ckpt = tmpDir("gsink_app_ck_")
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("id", "v").writeStream
      .format("graft")
      .option("checkpointLocation", ckpt)
      .option("statsCols", "id")
      .trigger(Trigger.AvailableNow())
      .start(dest)

    in.addData((0L, "a"), (1L, "b"))
    in.addData((2L, "c"))
    val q1 = start(); q1.awaitTermination()
    assert(ManifestSink.readBack(spark, dest).count() == 3L)
    // every micro-batch = one manifest version (AvailableNow may
    // drain both addData calls as one batch)
    val v1 = ManifestSink.history(spark, dest).count()
    assert(v1 >= 1L)

    // restart from the SAME checkpoint with more data: only the new
    // batch lands — nothing re-appends
    in.addData((3L, "d"), (4L, "e"))
    val q2 = start(); q2.awaitTermination()
    val got = ManifestSink.readBack(spark, dest)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e")))
    // stats carried: the appended files prune on id like batch writes
    assert(ManifestSink.readBackWhere(spark, dest, "id", 4, 4)
      .count() == 1L)
  }

  test("exactly-once is the WRITE ID, not luck: replaying a committed " +
      "batch through addBatch is a no-op; a different checkpoint is a " +
      "new logical stream") {
    val dest = s"${tmpDir("gsink_eo_")}/t"
    val sink = new GraftStreamSink(dest, None, Seq("id"), Nil, None,
      mor = false, checkpointTag = Some("ckpt-A"))
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    sink.addBatch(0L, df)
    assert(ManifestSink.readBack(spark, dest).count() == 2L)
    // the crash window: committed, but Spark's offset log didn't
    // record it — the engine re-delivers batch 0
    sink.addBatch(0L, df)
    assert(ManifestSink.readBack(spark, dest).count() == 2L)
    assert(ManifestSink.history(spark, dest).count() == 1L)
    // same batch id under a DIFFERENT checkpoint = a different stream
    val other = new GraftStreamSink(dest, None, Seq("id"), Nil, None,
      mor = false, checkpointTag = Some("ckpt-B"))
    other.addBatch(0L, df)
    assert(ManifestSink.readBack(spark, dest).count() == 4L)
  }

  test("pre-upgrade checkpoint replay: the restart's FIRST redelivered " +
      "batch is deduped against the legacy (path-keyed) writeId; a new " +
      "stream's colliding batchIds are NOT falsely skipped") {
    val dest = s"${tmpDir("gsink_legacy_")}/t"
    val ckpt = "/ckpt/legacy-stream"
    def legacyId(b: Long): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"graft-sink:$ckpt:$b".getBytes("UTF-8"))
        .take(8).map(x => f"$x%02x").mkString
    // what the pre-r18 sink committed: batches 0 and 1 under the
    // writeIds keyed on the raw checkpointLocation (no qid:/tag:)
    val b0 = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b1 = Seq((3L, "z")).toDF("id", "v")
    ManifestSink.stagedAppend(b0, dest, None, legacyId(0), Seq.empty)
    ManifestSink.finishCommit(spark, dest, legacyId(0))
    ManifestSink.stagedAppend(b1, dest, None, legacyId(1), Seq.empty)
    ManifestSink.finishCommit(spark, dest, legacyId(1))
    assert(ManifestSink.readBack(spark, dest).count() == 3L)
    // the upgraded sink restarts from that checkpoint: Spark
    // re-delivers the in-flight batch 1 FIRST — the new writeId would
    // miss the idempotency lookup, so the legacy-form guard skips it
    val sink = new GraftStreamSink(dest, None, Seq("id"), Nil, None,
      mor = false, checkpointTag = Some(ckpt))
    sink.addBatch(1L, b1)
    assert(ManifestSink.readBack(spark, dest).count() == 3L,
      "pre-upgrade batch replayed as a duplicate")
    // later batches land normally under the new identity
    sink.addBatch(2L, Seq((4L, "w")).toDF("id", "v"))
    assert(ManifestSink.readBack(spark, dest).count() == 4L)
    // a GENUINELY NEW stream (fresh sink, fresh checkpoint, batchIds
    // restarting at 0) must NOT be skipped against the old stream's
    // batch-0 writeId — path identity does not own the table
    val fresh = new GraftStreamSink(dest, None, Seq("id"), Nil, None,
      mor = false, checkpointTag = Some(ckpt))
    fresh.addBatch(0L, Seq((5L, "n")).toDF("id", "v"))
    assert(ManifestSink.readBack(spark, dest).count() == 5L,
      "a new stream's batch 0 was silently dropped")
  }

  test("a wiped-and-reused checkpoint is a NEW logical stream: its " +
      "batch 0 must APPEND, not replay-skip against the old stream's " +
      "writeIds") {
    val dest = s"${tmpDir("gsink_wipe_")}/t"
    val ckpt = tmpDir("gsink_wipe_ck_")
    val in1 = MemoryStream[(Long, String)]
    in1.addData((0L, "a"), (1L, "b"))
    val q1 = in1.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dest)
    q1.awaitTermination()
    assert(ManifestSink.readBack(spark, dest).count() == 2L)
    // wipe the checkpoint and reuse the SAME path: batchIds restart at
    // 0, but the fresh checkpoint mints a fresh queryId — the new
    // stream's batch 0 must land (a path-keyed writeId would collide
    // with the old stream's batch 0 and silently discard it)
    val ckptPath = new org.apache.hadoop.fs.Path(ckpt)
    ckptPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(ckptPath, true)
    val in2 = MemoryStream[(Long, String)]
    in2.addData((2L, "c"))
    val q2 = in2.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dest)
    q2.awaitTermination()
    assert(ManifestSink.readBack(spark, dest).count() == 3L)
  }

  test("mergeKey sink: per-batch atomic upsert — updates replace by " +
      "key, inserts append, mor=true keeps it dv-decomposable") {
    val dest = s"${tmpDir("gsink_mrg_")}/t"
    val ckpt = tmpDir("gsink_mrg_ck_")
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("id", "v").writeStream
      .format("graft")
      .option("checkpointLocation", ckpt)
      .option("mergeKey", "id").option("mor", "true")
      .option("statsCols", "id")
      .trigger(Trigger.AvailableNow())
      .start(dest)

    in.addData((0L, "a"), (1L, "b"), (2L, "c"))
    val q1 = start(); q1.awaitTermination()
    in.addData((1L, "B2"), (3L, "d"))
    val q2 = start(); q2.awaitTermination()
    val got = ManifestSink.readBack(spark, dest)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "a"), (1L, "B2"), (2L, "c"), (3L, "d")))
    // mor upsert: the key update committed deletion vectors, not a
    // file rewrite — the feed stays decomposable
    assert(ManifestSink.history(spark, dest)
      .where(col("kind") === "mor").count() >= 1L)
  }

  test("a mid-stream ALTER TABLE does not disturb the tail: the " +
      "schemaevo commit emits nothing (like layout snapshots) and " +
      "later appends keep flowing") {
    val dest = s"${tmpDir("gsink_alter_")}/t"
    val ckpt = tmpDir("gsink_alter_ck_")
    ManifestSink.statsAppend(
      Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1),
      dest, None, Seq("id"))
    def drain(): Long = {
      val got = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.format("graft").load(dest)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) => got.addAndGet(df.count()); ()
        }
        .start()
      q.awaitTermination()
      got.get()
    }
    assert(drain() == 2L)
    // metadata-only schema commit, then a widened append
    ManifestSink.alterSchema(spark, dest, cur =>
      org.apache.spark.sql.types.StructType(cur.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.DoubleType)))
    ManifestSink.statsAppend(
      Seq((2L, "c", 1.5)).toDF("id", "v", "extra").coalesce(1),
      dest, None, Seq("id"))
    // the tail resumes: only the new append's row arrives, the ALTER
    // version passed silently
    assert(drain() == 1L)
  }

  test("sink option validation: bad output mode and partitionBy() " +
      "refuse loudly") {
    val dest = s"${tmpDir("gsink_bad_")}/t"
    val in = MemoryStream[(Long, String)]
    val e1 = intercept[Exception] {
      in.toDF().toDF("id", "v").writeStream.format("graft")
        .outputMode("complete")
        .option("checkpointLocation", tmpDir("gsink_bad_ck1_"))
        .start(dest)
    }
    assert(e1.getMessage.contains("mergeKey") ||
      e1.getMessage.contains("output mode"), e1.getMessage)
    val e2 = intercept[Exception] {
      in.toDF().toDF("id", "v").writeStream.format("graft")
        .partitionBy("v")
        .option("checkpointLocation", tmpDir("gsink_bad_ck2_"))
        .start(dest)
    }
    assert(e2.getMessage.contains("partitionField"), e2.getMessage)
  }
}
