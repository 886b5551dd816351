package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ledger.Ledger
import graft.model.Task

/** Notification-driven trigger mode — the reference's primary cadence
  * (readme.md:19,105): bucket change notifications, not listings, decide
  * what to load.
  *
  * Why it matters at scale: listing-based discovery
  * ([[Ingest.listCandidates]]) is O(objects in the bucket) per run; this
  * path is O(new notifications). The "topic" is any Spark-readable feed of
  * `(eventType, base64 data, ordering cols)` rows — a parquet/json drop
  * location here, Kafka or a PubSub-bridge table in production; read it
  * as a batch (the reference's pull cadence, index.js:50–55) or as a
  * stream and call [[loadNotified]] per micro-batch from `foreachBatch`.
  *
  * The chain is fully relational until planning: decode + FINALIZE filter
  * + first-wins dedup ([[Events.finalizedObjects]]), then glob matching
  * with the SAME compiled `**`-aware regexes as the listing path
  * (codegen'd `regexp_like`, no listing RPC, no driver loop). Only the
  * matched, deduped batch — bounded by the pull cap, like the reference's
  * 1000-message pull — is collected for planning.
  */
object NotificationIngest {

  /** `scheme://bucket/name` URI column for decoded notifications. */
  def uriCol(scheme: String = "gs://"): Column =
    concat(lit(scheme), col("bucket"), lit("/"), col("name"))

  /** One boolean column: does `uri` match ANY task source glob — the
    * in-cluster form of [[Glob.matchesAny]] (same compiled regexes,
    * reference BucketToBigQuery.js:233–241).
    */
  def matchesTask(task: Task, uri: Column): Column =
    task.sources
      .map(g => regexp_like(uri, lit(Glob.compile(g).pattern())))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Deduped OBJECT_FINALIZE URIs from a raw notification frame that match
    * the task — `(selfLink, bucket, name, uri)`, one row per object,
    * first notification wins.
    */
  def candidateUris(
      notifications: DataFrame, task: Task,
      eventTypeCol: String = "eventType", dataCol: String = "data",
      orderCols: Seq[Column], scheme: String = "gs://"): DataFrame =
    Events.finalizedObjects(notifications, eventTypeCol, dataCol, orderCols)
      .withColumn("uri", uriCol(scheme))
      .filter(matchesTask(task, col("uri")))

  /** Which tasks have at least one matching notification — the reference's
    * `getTriggeredTaskInfos` (index.js:58). One relational pass: count
    * matches per task predicate, collect the (tiny) per-task counts.
    */
  def triggeredTasks(
      notifications: DataFrame, tasks: Seq[Task],
      eventTypeCol: String = "eventType", dataCol: String = "data",
      orderCols: Seq[Column], scheme: String = "gs://"): Seq[Task] = {
    if (tasks.isEmpty) return Nil
    val objs = Events
      .finalizedObjects(notifications, eventTypeCol, dataCol, orderCols)
      .withColumn("uri", uriCol(scheme))
    val counts = objs.select(tasks.zipWithIndex.map { case (t, i) =>
      sum(when(matchesTask(t, col("uri")), 1L).otherwise(0L)).as(s"t$i")
    }: _*).head()
    tasks.zipWithIndex.collect {
      case (t, i) if !counts.isNullAt(i) && counts.getLong(i) > 0 => t
    }
  }

  /** Plan a task from notifications instead of a listing: decode + match +
    * ledger anti-join + sniff + evolve. No bucket listing anywhere.
    */
  def planNotified(
      spark: SparkSession, task: Task, notifications: DataFrame,
      warehouseRoot: String,
      eventTypeCol: String = "eventType", dataCol: String = "data",
      orderCols: Seq[Column], scheme: String = "gs://"): Ingest.LoadPlan = {
    val candidates = candidateUris(notifications, task, eventTypeCol,
      dataCol, orderCols, scheme)
      .select(col("uri")).collect().map(_.getString(0)).toSeq.sorted
    Ingest.planFromCandidates(spark, task, candidates, warehouseRoot)
  }

  /** Notification-driven end-to-end load: the O(new files) counterpart of
    * [[Ingest.loadTask]], sharing its execute path (sink, ledger-after-
    * write, metrics).
    */
  def loadNotified(
      spark: SparkSession, task: Task, notifications: DataFrame,
      warehouseRoot: String,
      eventTypeCol: String = "eventType", dataCol: String = "data",
      orderCols: Seq[Column], scheme: String = "gs://",
      sink: Ingest.DestinationSink = Ingest.ParquetSink): Ingest.LoadResult =
    Ingest.executePlan(spark,
      planNotified(spark, task, notifications, warehouseRoot, eventTypeCol,
        dataCol, orderCols, scheme),
      sink)
}
