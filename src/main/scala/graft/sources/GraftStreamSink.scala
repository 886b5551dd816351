package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.Bridge

import graft.ingest.ManifestSink

/** `df.writeStream.format("graft").start(dest)` — the write half of
  * the native streaming surface (the read half is
  * [[GraftStreamSource]]): every micro-batch lands as ONE staged
  * atomic manifest commit.
  *
  * Exactly-once, without any sink-private ledger: the commit's
  * `writeId` is a deterministic function of (stream identity,
  * batchId), and [[ManifestSink]]'s commit protocol is idempotent by
  * writeId — a batch replayed after a crash between the manifest
  * commit and Spark's own offset checkpoint re-enters
  * `stageMoveCommit`, finds its writeId already in the log, and
  * commits nothing (Delta's `txnAppId`/`txnVersion` contract, carried
  * by the id the log already records instead of a separate txn line).
  * Stream identity is the streaming query's `queryId` (the
  * `sql.streaming.queryId` local property `StreamExecution` sets —
  * what Delta keys `txnAppId` on): it persists in the checkpoint's
  * `metadata` file, so restarting from the same checkpoint replays
  * the SAME writeIds (no duplicates), while a new — or wiped-and-
  * reused — checkpoint mints a fresh queryId and appends anew even
  * though its batchIds restart at 0. A checkpoint-PATH tag would get
  * both cases wrong: Spark does not pass the conf-resolved checkpoint
  * dir into V1 sink parameters, and a wiped-then-reused path would
  * reproduce old writeIds and silently discard real batches. Callers
  * driving `addBatch` outside a streaming query (no queryId property)
  * must pass an explicit tag; absent both, the sink fails loudly
  * rather than risk writeId collisions across streams.
  *
  * `option("mergeKey", k)` switches each batch from append to the
  * atomic upsert ([[ManifestSink.mergeIntoStatus]], whole-row by key,
  * `option("mor", "true")` for deletion-vector commits). Merge batches
  * are idempotent by VALUE (re-merging the last batch reproduces the
  * same state), which is exactly the window Spark's checkpoint can
  * replay; skipped/aborted merges THROW — a micro-batch that did not
  * apply must fail the query, not vanish (the upsertStream contract).
  *
  * Stats/bloom columns (`option("statsCols", "a,b")`,
  * `option("bloomCols", "k")`) build skipping metadata for every
  * appended file, so a long-running ingest stream produces a table
  * that prunes exactly like batch-built ones.
  */
final class GraftStreamSink(destPath: String,
    partitionField: Option[String], statsCols: Seq[String],
    bloomCols: Seq[String], mergeKey: Option[String], mor: Boolean,
    checkpointTag: Option[String]) extends Sink {

  // true until this Sink INSTANCE delivers its first batch — a restart
  // constructs a fresh sink, so "first batch after restart" is the
  // only window a pre-upgrade checkpoint can replay into
  @volatile private var firstBatch = true

  private def streamTag(spark: org.apache.spark.sql.SparkSession)
      : String = {
    // StreamExecution.QUERY_ID_KEY — stable across restarts from the
    // same checkpoint, fresh for a new (or wiped) checkpoint
    val qid =
      spark.sparkContext.getLocalProperty("sql.streaming.queryId")
    if (qid != null && qid.nonEmpty) s"qid:$qid"
    else checkpointTag.map(t => s"tag:$t").getOrElse(
      throw new IllegalStateException(
        "[graft] sink: no streaming queryId on this thread and no " +
          "explicit tag — driving addBatch outside a streaming query " +
          "needs option(\"checkpointLocation\", ...) so writeIds " +
          "cannot collide across logical streams"))
  }

  private def writeIdFor(tag: String, batchId: Long): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(
      s"graft-sink:$tag:$batchId"
        .getBytes(StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString // 16 hex chars, id-shaped
  }

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val spark = data.sparkSession
    // V1 Sink data is isStreaming=true — re-wrap as a batch frame
    val batch: DataFrame = Bridge.batchDataFrame(spark, data.toDF())
    mergeKey match {
      case Some(k) =>
        val outcome = ManifestSink.mergeIntoStatus(spark, destPath,
          batch, k, partitionField, statsCols, mor)
        outcome match {
          case ManifestSink.MergeOutcome.Skipped =>
            throw new IllegalStateException(
              s"[graft] sink batch $batchId did NOT merge into " +
                s"$destPath: a staged attempt is pending (crashed " +
                "writer?). Run ManifestSink.recover after confirming " +
                "no live writer, then restart the stream.")
          case ManifestSink.MergeOutcome.Aborted =>
            throw new IllegalStateException(
              s"[graft] sink batch $batchId aborted merging into " +
                s"$destPath: a concurrent writer advanced the log. " +
                "Restart the stream to retry the batch.")
          case _ => ()
        }
      case None =>
        // UPGRADE GUARD: r18 moved stream identity from the
        // checkpointLocation/destPath tag to the queryId. A stream
        // restarted from a PRE-UPGRADE checkpoint replays its last
        // in-flight batch under a DIFFERENT (new) writeId, so the
        // idempotency lookup would miss and the batch would
        // double-append once. Scope matters: the replayed in-flight
        // batch is exactly the FIRST batch a restarted query delivers
        // and carries a batchId its earlier run already advanced past
        // (> 0) — checking every batch would resurrect path identity
        // wholesale and silently DROP every batch of a genuinely new
        // stream whose ids collide with pre-upgrade history (the very
        // bug the queryId move fixed). A pre-upgrade stream that
        // crashed inside its first-ever batch (batchId 0) is
        // unresolvable either way; it duplicates once — duplicates
        // are visible and cleanable, silent loss is neither.
        if (firstBatch && batchId > 0) {
          val legacyId = writeIdFor(
            checkpointTag.getOrElse(destPath), batchId)
          if (ManifestSink.hasWriteId(spark, destPath, legacyId)) {
            // a TRUE replay redelivers byte-identical content, so the
            // committed batch's row count (a footer-only read) must
            // equal this one's. A GENUINELY NEW stream on a reused
            // checkpoint path whose batchId collides with pre-upgrade
            // history almost surely differs — appending then is the
            // difference between one visible duplicate and silent
            // loss. Count-unresolvable ids (the committing manifest
            // was compacted away) keep the conservative skip: that is
            // a long-retired pre-upgrade checkpoint, not a fresh
            // stream's first commit.
            val committed =
              ManifestSink.rowsOfWriteId(spark, destPath, legacyId)
            if (committed.forall(_ == batch.count())) {
              println(s"METRIC graft.sink.legacy_writeid_replay_skip=1 " +
                s"batch=$batchId dest=$destPath")
              firstBatch = false
              return
            }
            println(s"METRIC graft.sink.legacy_writeid_collision=1 " +
              s"batch=$batchId committed_rows=${committed.get} " +
              s"dest=$destPath")
          }
        }
        firstBatch = false
        val writeId = writeIdFor(streamTag(spark), batchId)
        if (statsCols.nonEmpty || bloomCols.nonEmpty)
          ManifestSink.statsAppend(batch, destPath, partitionField,
            if (statsCols.nonEmpty) statsCols else bloomCols,
            bloomCols = bloomCols, writeId = Some(writeId))
        else {
          ManifestSink.stagedAppend(batch, destPath, partitionField,
            writeId, Seq.empty)
          ManifestSink.finishCommit(spark, destPath, writeId)
        }
    }
  }

  override def toString: String =
    s"GraftStreamSink[$destPath" +
      mergeKey.map(k => s", upsert on $k").getOrElse("") + "]"
}
