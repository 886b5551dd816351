package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ingest.ManifestSink

/** `spark.readStream.format("graft").load(dest)` — the manifest table's
  * CDC tails as a REAL Structured Streaming source, so Spark's own
  * offset/commit logs own the exactly-once contract and
  * `Trigger.AvailableNow`, rate control, and `foreachBatch` compose
  * natively (the reference's streaming surface is its MemoryStream
  * feeding BigQuery loads, MemoryStream.js:1; this is the Spark-first
  * equivalent over the lakehouse log). The hand-rolled drain loops
  * (`StreamingIngest.changesStream` / `changeFeedStream`) remain for
  * scheduler-less callers; this source packages the same per-version
  * feeds behind Spark's `Source` seam:
  *
  *  - OFFSETS ARE MANIFEST VERSIONS. `latestOffset` lists the log head
  *    (O(listing) driver metadata); `getBatch(start, end]` replays
  *    exactly the committed versions in the range through
  *    [[ManifestSink.appendFeed]] / [[ManifestSink.changeFeed]] — the
  *    same snapshot-cut, layout-skip, and refuse-on-COW semantics as
  *    the batch feeds, so a mid-stream optimize/compact neither
  *    duplicates nor drops and a non-decomposable commit fails loudly
  *    instead of corrupting the tail.
  *  - ADMISSION CONTROL (the `FileStreamSource` shape —
  *    `SupportsAdmissionControl` on a V1 `Source`): each micro-batch
  *    admits at most `maxVersionsPerTrigger` versions (default
  *    [[GraftStreamSource.DefaultMaxVersions]]), so a first drain of a
  *    1,000-commit log runs as bounded batches instead of one
  *    1,000-way union plan. `Trigger.AvailableNow` pins the end at the
  *    head captured at query start and still chunks its way there.
  *  - A batch reads ONLY its versions' own files/sidecars — never a
  *    table scan, never a diff: O(changed rows) per micro-batch at any
  *    table size.
  *  - Restart replay is Spark's: an uncommitted batch re-runs with the
  *    SAME version range (versions are durable, immutable coordinates),
  *    so the sink sees identical rows — exactly-once end to end with
  *    an idempotent/transactional sink.
  *
  * Options: `feed` = `appends` (default; append-only versions, refuses
  * content-changing commits) or `changes` (row-level feed with
  * `_change_type`/`_commit_version`, mor commits decomposed);
  * `startingVersion` = version to tail from (exclusive; default `-1` =
  * everything surviving) or `latest` (only versions committed after
  * stream start); `maxVersionsPerTrigger` = admission cap.
  */
final class GraftStreamSource(spark: SparkSession, destPath: String,
    rowLevel: Boolean, startingVersion: Long,
    declaredSchema: Option[StructType], maxVersionsPerTrigger: Int)
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger > 0,
    s"[graft] maxVersionsPerTrigger must be positive, " +
      s"got $maxVersionsPerTrigger")

  override val schema: StructType = declaredSchema.getOrElse(
    GraftStreamSource.schemaFor(spark, destPath, rowLevel))

  /** COLUMN MAPPING (logical → physical), resolved from the LOG once
    * at source creation — same lifetime as `schema`. A rename
    * committed mid-stream changes the schema contract and needs a
    * restart, exactly like ADD/DROP.
    */
  private val renameMap: Map[String, String] =
    graft.ingest.ManifestSink.mappingOf(
      graft.ingest.ManifestSink.snapshotHandle(spark, destPath)
        .schemaOpt)

  // Trigger.AvailableNow: the drain's end is the head at query START —
  // versions committed while draining wait for the next run
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val head = GraftStreamSource.headVersion(spark, destPath)
    availableNowEnd = Some(head)
    println(s"METRIC graft.stream.available_now_end=$head dest=$destPath")
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxVersionsPerTrigger) // versions, as "files"

  /** The paced head: at most the admission cap past `startOffset`,
    * never past an AvailableNow pin. Null = no new data.
    */
  override def latestOffset(startOffset: OffsetV2,
      limit: ReadLimit): OffsetV2 = {
    val since = Option(startOffset).map(versionOf)
      .getOrElse(startingVersion)
    val head0 = GraftStreamSource.headVersion(spark, destPath)
    val head = availableNowEnd.fold(head0)(math.min(_, head0))
    val capped = limit match {
      case m: ReadMaxFiles => math.min(head, since + m.maxFiles())
      case _: ReadAllAvailable => head
      case _ => math.min(head, since + maxVersionsPerTrigger)
    }
    if (capped <= since || capped < 0) null else LongOffset(capped)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val head = GraftStreamSource.headVersion(spark, destPath)
    if (head < 0) null else LongOffset(head)
  }

  /** Kept for scheduler-less callers; the engine itself routes through
    * `latestOffset` (admission control wins for sources that declare
    * it). Uncapped: the true head.
    */
  override def getOffset: Option[Offset] = {
    val head = GraftStreamSource.headVersion(spark, destPath)
    if (head < 0 || head <= startingVersion) None
    else Some(LongOffset(head))
  }

  private def versionOf(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(o => versionOf(o)).getOrElse(startingVersion)
    val until = versionOf(end)
    // Restart tolerance: on recovery Spark re-issues getBatch for the
    // last COMMITTED range to re-initialize the source
    // (MicroBatchExecution.populateStartOffsets). If a compaction ran
    // while the stream was down, that range can lie entirely below the
    // surviving floor — its data was already delivered and committed,
    // so an empty frame is correct. A range that STRADDLES the floor
    // still refuses through the feed (an uncommitted version was
    // compacted away: unrecoverable, fail loudly).
    val floor = ManifestSink.survivingFloor(spark, destPath)
    if (until < floor) {
      println(s"METRIC graft.stream.replay_below_floor=1 " +
        s"since=$since until=$until floor=$floor dest=$destPath")
      return org.apache.spark.sql.graft.StreamingFrame.asStreaming(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema))
    }
    val frames: Seq[DataFrame] =
      if (rowLevel) {
        val (feed, _) =
          ManifestSink.changeFeed(spark, destPath, since, until)
        println(s"METRIC graft.stream.batch versions=${feed.length} " +
          s"since=$since until=$until feed=changes dest=$destPath")
        feed.map { case (_, thunk) => conform(thunk()) }
      } else {
        // ONE scan for the whole admitted range: a per-version read
        // pays a DataSource resolution (~100 ms of driver work) per
        // version, which makes draining a deep backlog
        // O(versions x resolution) — a cold tail of a year-old table
        // spent seconds per micro-batch on planning alone. Instead
        // the batch reads every admitted file in one relation and
        // derives `_commit_version` from a broadcast
        // (file name -> version) map; files are unique to their
        // commit (write ids name them), so the mapping is exact.
        val (feed, _) =
          ManifestSink.appendFeedFiles(spark, destPath, since, until)
        println(s"METRIC graft.stream.batch versions=${feed.length} " +
          s"since=$since until=$until feed=appends dest=$destPath")
        if (feed.isEmpty) Nil
        else {
          import spark.implicits._
          val destHadoop = new org.apache.hadoop.fs.Path(destPath)
          val nameToV = feed.flatMap { case (v, rels) =>
            rels.map(rel => rel.substring(rel.lastIndexOf('/') + 1) -> v)
          }
          val files = feed.flatMap(_._2).map(rel =>
            new org.apache.hadoop.fs.Path(destHadoop, rel).toString)
          val vdf = nameToV.toDF("__graft_fn", "_commit_version")
          // read under the stream's OWN data schema (minus the feed
          // columns): an admitted window spanning an ALTER COLUMN
          // TYPE widen mixes physical types across its files, which
          // a footer mergeSchema union would refuse — the explicit
          // schema upcasts per file instead. COLUMN MAPPING: files
          // carry PHYSICAL names — request those, surface logical
          // (renameMap is pinned at source creation, like the schema)
          val dataSchema = org.apache.spark.sql.types.StructType(
            schema.fields.filterNot(f =>
              f.name == "_commit_version" || f.name == "_change_type")
              .map(f => renameMap.collectFirst {
                case (l, p) if l.equalsIgnoreCase(f.name) =>
                  f.copy(name = p)
              }.getOrElse(f)))
          val df0 = spark.read.schema(dataSchema)
            .option("basePath", destPath)
            .parquet(files: _*)
            .withColumn("__graft_fn", col("_metadata.file_name"))
            .join(broadcast(vdf), Seq("__graft_fn"))
            .drop("__graft_fn")
          val p2l = renameMap.map(_.swap)
          val df =
            if (renameMap.isEmpty) df0
            else df0.withColumnsRenamed(
              p2l.filter { case (p, _) => df0.columns.contains(p) })
          Seq(conform(df))
        }
      }
    // the v1 Source contract: the returned plan must carry
    // isStreaming = true (see [[org.apache.spark.sql.graft.StreamingFrame]])
    org.apache.spark.sql.graft.StreamingFrame.asStreaming(
      if (frames.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else frames.reduce(_ unionByName _))
  }

  /** Conform a version frame to the stream's fixed schema: the table
    * evolves by prefix/superset, so an old version's files may lack
    * trailing columns (null-filled) and column order must match the
    * source schema positionally (the v1 `Source` contract binds
    * attributes by position).
    */
  private def conform(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$destPath, " +
      s"feed=${if (rowLevel) "changes" else "appends"}]"
}

object GraftStreamSource {

  /** Default admission cap: versions admitted per micro-batch. Wide
    * enough that steady-state tails (a few versions per trigger) never
    * notice it; tight enough that a cold drain of a long log builds
    * bounded union plans.
    */
  val DefaultMaxVersions = 64

  /** Head version of the log, `-1` when the table has no commits —
    * one listing, no manifest opens.
    */
  private[graft] def headVersion(spark: SparkSession,
      destPath: String): Long =
    ManifestSink.snapshotHandle(spark, destPath).version

  /** Stream schema: the committed table schema — the LOG-resolved
    * schema ([[ManifestSink.SnapshotHandle.schemaOpt]]: zero footer
    * reads, and ALTER ADD/DROP commits are honored exactly like batch
    * reads), falling back to the footer sweep only for legacy logs —
    * plus the feed columns. `appends` carries `_commit_version` so
    * idempotent sinks can key on it; `changes` carries `_change_type`
    * + `_commit_version` (set by the feed itself).
    */
  private[graft] def schemaFor(spark: SparkSession, destPath: String,
      rowLevel: Boolean): StructType = {
    val handle = ManifestSink.snapshotHandle(spark, destPath)
    require(handle.targets.nonEmpty,
      s"[graft] readStream.format(\"graft\"): $destPath has no " +
        "committed data to resolve a schema from — pass .schema(...) " +
        "explicitly or commit a first batch")
    // STRIPPED of the column-mapping metadata: this schema surfaces to
    // the user and rides into whatever sink the stream writes — a
    // graft sink downstream must not inherit a bogus mapping (the
    // source keeps its own renameMap for the physical read)
    val base = ManifestSink.stripPhysical(handle.schemaOpt.getOrElse {
      val dest = new Path(destPath)
      spark.read.option("mergeSchema", "true")
        .option("basePath", destPath)
        .parquet(handle.targets.map(rel =>
          new Path(dest, rel).toString): _*)
        .schema
    })
    val extras =
      (if (rowLevel) Seq(StructField("_change_type", StringType))
       else Seq.empty) :+ StructField("_commit_version", LongType)
    StructType(base.fields.filterNot(f =>
      extras.exists(_.name == f.name)) ++ extras)
  }

  /** Resolve the `startingVersion` option: a version number
    * (exclusive lower bound), `latest` (head at stream start), or
    * absent = `-1` (every surviving version).
    */
  private[graft] def resolveStartingVersion(spark: SparkSession,
      destPath: String, opt: Option[String]): Long = opt match {
    case None           => -1L
    case Some("latest") => headVersion(spark, destPath)
    case Some(v)        => v.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"[graft] startingVersion must be a version or 'latest', " +
          s"got '$v'"))
  }
}
