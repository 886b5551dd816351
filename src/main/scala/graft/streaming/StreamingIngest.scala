package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.Task

/** Streaming mode of the ingest pipeline.
  *
  * The reference is micro-batch by construction: PubSub OBJECT_FINALIZE
  * notifications pulled periodically, files loaded once each, acks after
  * load (reference readme.md:19-20, BucketToBigQuery.js:99-121; SURVEY
  * §2.9). Structured Streaming's file source subsumes that whole
  * notification+ledger mechanism: the checkpoint's seen-files log IS the
  * ledger, discovery by listing replaces notifications, and
  * Trigger.AvailableNow reproduces the reference's "drain everything
  * currently there, then stop" batch cadence.
  *
  * Scale posture: `maxFilesPerTrigger` bounds micro-batch size (the
  * reference's 1000-events-per-run cap); event-time DAY partitioning on
  * write means late files land in their correct partitions with no
  * watermark needed (ST3) — and when a watermarked windowed aggregate IS
  * wanted, [[windowedChannelStats]] below shows the shape.
  */
object StreamingIngest {

  /** Start a streaming load of a task's CSV sources into the destination,
    * Trigger.AvailableNow (drain-and-stop, the reference's cadence).
    */
  def start(
      spark: SparkSession,
      task: Task,
      schema: StructType,
      sourceDir: String,
      warehouseRoot: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    val destPath = s"$warehouseRoot/${task.dataset}/${task.table}"
    val partField = graft.schema.SchemaEvolution.effectivePartitionField(
      task.timePartitioningField, task.timePartitioningFieldSet, schema)

    val src = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(sourceDir)

    val withPart = partField match {
      case Some(f) => src.withColumn(graft.ingest.Ingest.PartitionCol,
        to_date(col(f)))
      case None => src
    }

    val writer = withPart.writeStream
      .format("parquet")
      .option("path", destPath)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
    partField.fold(writer)(_ =>
      writer.partitionBy(graft.ingest.Ingest.PartitionCol)).start()
  }

  /** Notification-driven STREAMING ingest: the topic is a Spark-readable
    * stream of JSON notification rows `(eventType, data, seq)` (a drop
    * directory here; Kafka or a PubSub bridge in production). Each
    * micro-batch runs the full relational decode → glob-match → ledger →
    * load pipeline via [[graft.ingest.NotificationIngest.loadNotified]] in
    * `foreachBatch` — so discovery is O(new notifications) (no listing),
    * and the LEDGER (not only the checkpoint) provides effectively-once
    * per file: replayed or duplicated notifications are anti-joined away
    * even if the checkpoint is lost.
    */
  def startNotified(
      spark: SparkSession,
      task: Task,
      notificationsDir: String,
      warehouseRoot: String,
      checkpointDir: String,
      scheme: String = "gs://",
      maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    val notifSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("eventType",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("data",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType)))
    spark.readStream
      .schema(notifSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(notificationsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ingest.NotificationIngest.loadNotified(
          spark, task, batch, warehouseRoot,
          orderCols = Seq(col("seq")), scheme = scheme)
        ()
      }
      .start()
  }

  // ---- streaming CURATED ingest (near-dedup in the ingest path) --------

  private def readCorpus(spark: SparkSession, corpusDir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(corpusDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Read a curation-side table through a [[graft.ingest.Ingest
    * .DestinationSink]], normalized to `schema`: a missing or
    * never-committed table is an empty relation WITH the schema (the
    * sink's bare readBack returns a column-less frame there, which would
    * break the anti-joins), and a committed table is projected onto the
    * schema's columns so sink-side extras (partition dirs) never leak
    * into the curation joins.
    */
  private def readVia(spark: SparkSession,
      sink: graft.ingest.Ingest.DestinationSink, dir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df =
      if (fs.exists(p)) sink.readBack(spark, dir) else spark.emptyDataFrame
    if (df.columns.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else df.select(schema.fieldNames.toSeq.map(col): _*)
  }

  /** Ids already adjudicated by earlier (possibly crashed) batch attempts:
    * corpus members plus victim-log `b_id`s. Filtering the incoming batch
    * against this set makes [[curateDocBatch]]/[[curateVectorBatch]]
    * IDEMPOTENT under foreachBatch replay — a replayed micro-batch whose
    * docs were already appended (either side) reduces to the empty set, so
    * the at-least-once foreachBatch contract composes to effectively-once
    * output without a staged-commit protocol.
    */
  private def adjudicatedIds(spark: SparkSession, corpus: DataFrame,
      victimLogDir: Option[String], idCol: String,
      sink: Option[graft.ingest.Ingest.DestinationSink]): DataFrame = {
    val corpusIds = corpus.select(col(idCol))
    val victimIds = victimLogDir.map { d =>
      // Explicit one-column schema: a crash during the very first
      // victim-log write can leave the dir with only _temporary/ (no
      // committed data file), where schema INFERENCE throws — which would
      // wedge exactly the replay path this anti-join protects. With the
      // schema given, an empty listing is just an empty relation, and on
      // the happy path Spark prunes the read to the one column anyway.
      val vSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "b_id", corpus.schema(idCol).dataType)))
      sink match {
        case Some(s) =>
          readVia(spark, s, d, vSchema).select(col("b_id").as(idCol))
        case None =>
          val p = new org.apache.hadoop.fs.Path(d)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p))
            spark.read.schema(vSchema).parquet(d)
              .select(col("b_id").as(idCol))
          else corpusIds.limit(0)
      }
    }.getOrElse(corpusIds.limit(0))
    corpusIds.unionByName(victimIds)
  }

  /** One text-curation step: near-dedup a new document batch against the
    * already-curated corpus via the INCREMENTAL candidate index
    * ([[graft.operators.Dedup.incrementalJaccardDupPairs]] — cost scales
    * with |batch| x bucket occupancy, never |corpus|^2), append the
    * survivors to the corpus and the verified dup pairs to the victim log.
    *
    * First-wins contract: ingest assigns MONOTONICALLY increasing doc ids
    * (the ledger already guarantees disjointness), so the larger pair
    * member `b_id` is always the newer doc — dropping `b_id` keeps the
    * established corpus stable and makes the final corpus equal the batch
    * recompute's survivor set (StreamingIngestSpec proves it across
    * batches). The frames are localCheckpoint'ed so the two appends
    * below never scan `corpusDir` while writing into it.
    *
    * Replay-idempotent: the batch is first anti-joined against
    * [[adjudicatedIds]] (corpus ∪ victim log), so a foreachBatch replay
    * after a crash re-adjudicates only the not-yet-persisted remainder —
    * fully-processed replays are no-ops, and a crash between the victim-log
    * append and the corpus append resumes with exactly the survivor side
    * (already-logged victims are filtered out, so no duplicate log rows).
    *
    * With `indexDir` set, the corpus band index is PERSISTED and appended
    * per batch instead of re-derived from the whole corpus every batch —
    * the per-batch cost drops from O(corpus) to O(batch x occupancy +
    * touched partners) (see
    * [[graft.operators.Dedup.incrementalJaccardDupPairsIndexed]]); append
    * order (victims -> index -> corpus) plus a doc_id anti-join keeps
    * every crash window replay-safe, see the inline note.
    *
    * With `sink = Some(ManifestSink)`, every append (victims, index,
    * corpus) COMMITS ATOMICALLY through the manifest log and every read
    * goes through the committed file set — a reader of the curated corpus
    * never sees a partially-written micro-batch (the plain path's moved
    * files become listing-visible one task at a time), and a crash
    * mid-append leaves readers on the exact pre-batch snapshot. The
    * replay logic is UNCHANGED: id-keyed idempotence handles
    * at-least-once delivery either way; the sink only upgrades what a
    * concurrent reader can observe mid-batch.
    */
  def curateDocBatch(spark: SparkSession, batch: DataFrame,
      corpusDir: String, victimLogDir: Option[String],
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      indexDir: Option[String] = None,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None,
      gate: Option[org.apache.spark.sql.Column] = None): Unit = {
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val corpus = sink match {
      case Some(s) => readVia(spark, s, corpusDir, batch.schema)
      case None    => readCorpus(spark, corpusDir, batch.schema)
    }
    val freshAll = batch
      .join(adjudicatedIds(spark, corpus, victimLogDir, "doc_id", sink),
        Seq("doc_id"), "left_anti")
    // QUALITY GATE: a row-deterministic predicate (quality rules, a
    // trained classifier score, a length cutoff) applied before any
    // dedup work — rejected docs never reach the corpus, the victim
    // log, or the index, and cost nothing downstream. Row-determinism
    // is the idempotence contract: a replayed rejected doc is not
    // adjudicated, re-enters here, and is re-rejected identically, so
    // no reject log is needed (same argument as hash-threshold
    // sampling). A gate that read mutable external state would break
    // replay; don't.
    val fresh = gate.map(freshAll.where(_)).getOrElse(freshAll)
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    val pairs = (indexDir match {
      case Some(d) =>
        graft.operators.Dedup.incrementalJaccardDupPairsIndexed(
          fresh, corpus,
          readIndex(spark, d, batch.schema("doc_id").dataType, sink),
          threshold, maxBucketSize)
      case None =>
        graft.operators.Dedup
          .incrementalJaccardDupPairs(fresh, corpus, threshold, maxBucketSize)
    }).localCheckpoint(false)
    val victims = pairs.select(col("b_id").as("doc_id")).distinct()
    victimLogDir.foreach(d => append(pairs, d))
    val survivors = fresh.join(victims, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // INDEX BEFORE CORPUS: a crash in between leaves index rows for docs
    // not yet in the corpus; the replay re-adjudicates those docs (they
    // are not in adjudicatedIds), reaches the same survivor verdict under
    // the single-writer contract, skips the already-present index rows
    // via the anti-join below, and completes the corpus append. The
    // reverse order would strand corpus docs WITHOUT index rows — and
    // since corpus members are adjudicated, no replay would ever repair
    // the index, silently blinding all future candidate joins to them.
    indexDir.foreach { d =>
      val existing =
        readIndex(spark, d, batch.schema("doc_id").dataType, sink)
          .select(col("doc_id")).distinct()
      append(graft.operators.Dedup.bandIndexRows(survivors)
        .join(existing, Seq("doc_id"), "left_anti"), d)
    }
    append(survivors, corpusDir)
  }

  /** The persisted corpus band index (see
    * [[graft.operators.Dedup.incrementalJaccardDupPairsIndexed]]) with an
    * explicit schema — the same crash-debris lesson as the victim log:
    * a dir holding only _temporary/ must read as empty, not throw on
    * schema inference.
    */
  private def readIndex(spark: SparkSession, dir: String,
      idType: org.apache.spark.sql.types.DataType,
      sink: Option[graft.ingest.Ingest.DestinationSink]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", idType),
      org.apache.spark.sql.types.StructField("bkey",
        org.apache.spark.sql.types.StringType)))
    sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Vector-side curation step: same shape over embeddings via
    * [[graft.operators.Similarity.incrementalNearDupPairs]] (multi-table
    * sign-LSH candidate index, cosine-verified).
    */
  def curateVectorBatch(spark: SparkSession, batch: DataFrame,
      corpusDir: String, victimLogDir: Option[String],
      threshold: Double, nPlanes: Int, nTables: Int = 1,
      maxBucketSize: Int = 1000, indexDir: Option[String] = None,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): Unit = {
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val corpus = sink match {
      case Some(s) => readVia(spark, s, corpusDir, batch.schema)
      case None    => readCorpus(spark, corpusDir, batch.schema)
    }
    val fresh = batch
      .join(adjudicatedIds(spark, corpus, victimLogDir, "vec_id", sink),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    val pairs = (indexDir match {
      case Some(d) =>
        graft.operators.Similarity.incrementalNearDupPairsIndexed(
          fresh, corpus,
          readVecIndex(spark, d, batch.schema("vec_id").dataType, sink),
          threshold, nPlanes, nTables, maxBucketSize)
      case None =>
        graft.operators.Similarity.incrementalNearDupPairs(
          fresh, corpus, threshold, nPlanes, nTables, maxBucketSize)
    }).localCheckpoint(false)
    val victims = pairs.select(col("b_id").as("vec_id")).distinct()
    victimLogDir.foreach(d => append(pairs, d))
    val survivors = fresh.join(victims, Seq("vec_id"), "left_anti")
      .localCheckpoint(false)
    // same victims -> index -> corpus ordering + anti-join as the doc path
    indexDir.foreach { d =>
      val existing =
        readVecIndex(spark, d, batch.schema("vec_id").dataType, sink)
          .select(col("id")).distinct()
      append(graft.operators.Similarity
        .bucketIndexRows(survivors, nPlanes, nTables)
        .join(existing, Seq("id"), "left_anti"), d)
    }
    append(survivors, corpusDir)
  }

  /** IMAGE-modality curation step: incremental PERCEPTUAL dedup via
    * [[graft.multimodal.Multimodal.dhash64]] + the pigeonhole hamming
    * pairer — catches re-encoded / recompressed / renamed copies of
    * corpus images that byte-level ids and hashes cannot pair. The batch
    * is `(media_id, kind, payload)`; the curated corpus persists
    * `(media_id, kind, payload, dhash)` so later batches and replays
    * pair against STORED hashes without re-decoding one corpus image
    * (the 8-byte fingerprint IS its own slim index — no separate
    * bucket-index relation, unlike the vector path). Protocol mirrors
    * [[curateDocBatch]]: adjudicated-id anti-join makes a replayed batch
    * a no-op, victim pairs are logged, survivors append atomically when
    * a `sink` is given. Undecodable payloads hash null and always
    * survive — there is no perceptual basis to dedup them.
    */
  def curateMediaBatch(spark: SparkSession, batch: DataFrame,
      corpusDir: String, victimLogDir: Option[String],
      maxHamming: Int, maxBucketSize: Int = 1000,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val corpusSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("dhash",
        org.apache.spark.sql.types.LongType)))
    val corpus = (sink match {
      case Some(s) => readVia(spark, s, corpusDir, corpusSchema)
      case None    => readCorpus(spark, corpusDir, corpusSchema)
    }).localCheckpoint(false)
    val fresh = batch
      .join(adjudicatedIds(spark, corpus, victimLogDir, "media_id", sink),
        Seq("media_id"), "left_anti")
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    // hash once per batch payload; the corpus side reuses stored hashes
    val freshHashed = fresh.join(
      graft.multimodal.Multimodal.dhashMedia(
        fresh.select(col("media_id"), col("kind"), col("payload"))
          .as[graft.multimodal.Multimodal.MediaRow]),
      Seq("media_id"))
      .localCheckpoint(false)
    val pairs = graft.operators.Dedup.incrementalHammingDupPairs(
      freshHashed.select(col("media_id"), col("dhash")),
      corpus.select(col("media_id"), col("dhash")),
      maxHamming, idCol = "media_id", hashCol = "dhash",
      maxBucketSize = maxBucketSize)
      .localCheckpoint(false)
    val victims = pairs.select(col("b_id").as("media_id")).distinct()
    victimLogDir.foreach(d => append(pairs, d))
    append(freshHashed.join(victims, Seq("media_id"), "left_anti"),
      corpusDir)
  }

  /** Persisted vector bucket index, explicit schema (crash-debris safe). */
  private def readVecIndex(spark: SparkSession, dir: String,
      idType: org.apache.spark.sql.types.DataType,
      sink: Option[graft.ingest.Ingest.DestinationSink]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField}
    val schema = org.apache.spark.sql.types.StructType(Seq(
      StructField("id", idType),
      StructField("t", IntegerType),
      StructField("bucket", LongType)))
    sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Streaming CURATED ingest end-to-end: a drop directory of JSON-lines
    * documents `(doc_id, text)` drains through `foreachBatch` where each
    * micro-batch is incrementally near-deduped against the curated corpus
    * before being appended — the pipeline a real training-data ingest runs,
    * composed from the same operators the batch queries use.
    *
    * Delivery semantics: foreachBatch is AT-LEAST-ONCE (a crash after the
    * parquet appends but before the checkpoint commit replays the
    * micro-batch); [[curateDocBatch]]'s adjudicated-id anti-join makes the
    * replay a no-op, so the composition is effectively-once per document —
    * checkpoint for file-level progress, id-keyed idempotence for the
    * output. The per-batch dedup gives first-wins per near-dup cluster
    * across the whole stream.
    */
  def startCurated(
      spark: SparkSession,
      docsDir: String,
      schema: StructType,
      corpusDir: String,
      victimLogDir: Option[String],
      checkpointDir: String,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      maxFilesPerTrigger: Int = 1000,
      indexDir: Option[String] = None,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None)
      : StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateDocBatch(spark, batch, corpusDir, victimLogDir,
          threshold, maxBucketSize, indexDir, sink)
      }
      .start()

  /** Streaming first-seen filter — the ledger's effectively-once semantics
    * as a row-level stateful operator: for each key, emit only the first
    * record ever seen; per-key state is one boolean, kept in the state
    * store across micro-batches. This is `uniqBy` (reference
    * BucketToBigQuery.js:221) extended across batches via
    * `flatMapGroupsWithState` — the custom-state shape
    * (`KeyValueGroupedDataset`) for anything the built-in
    * `dropDuplicates` watermark eviction can't express.
    *
    * State is O(distinct keys); at scale pair with a watermark-based
    * `dropDuplicates` for bounded state unless keys are genuinely finite
    * (file URIs, entity ids).
    */
  def firstSeen[K: org.apache.spark.sql.Encoder,
      V: org.apache.spark.sql.Encoder](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V])
      : org.apache.spark.sql.Dataset[V] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val boolEnc: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    grouped.flatMapGroupsWithState[Boolean, V](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          rows.take(1) // first within the batch wins, rest deduped
        }
    }
  }

  /** Incremental TERM-INDEX maintenance — the streaming companion of
    * [[graft.operators.TextRank.termIndex]]: append each micro-batch's
    * `(doc_id, token, tf)` rows plus the `(doc_id, dl)` length relation
    * to persisted tables, so [[graft.operators.TextRank.bm25FromIndex]]
    * / `bm25BatchFromIndex` retrieve against an always-current index
    * without EVER re-tokenizing the corpus (the per-query cost the
    * index exists to kill, made incremental). Compose after
    * [[curateDocBatch]] in the same foreachBatch to index exactly the
    * curated survivors.
    *
    * Crash idempotence is the band-index lesson (see curateDocBatch's
    * ordering comment): EACH relation anti-joins on its own stored doc
    * ids, and the dl relation — appended LAST — is the adjudication
    * set. A crash between the two appends leaves index rows without dl
    * rows; the replay re-enters the doc (not in dl), skips its
    * already-present index rows, and completes the dl append. The
    * reverse order would adjudicate docs whose index rows never landed
    * — invisible to every future retrieval, unrepairable.
    */
  def indexDocBatch(spark: SparkSession, batch: DataFrame,
      indexDir: String, dlDir: String,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): Unit = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
      StructField, StructType}
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val idType = batch.schema("doc_id").dataType
    val idxSchema = StructType(Seq(StructField("doc_id", idType),
      StructField("token", StringType), StructField("tf", LongType)))
    val dlSchema = StructType(Seq(StructField("doc_id", idType),
      StructField("dl", DoubleType)))
    def read(dir: String, schema: StructType): DataFrame = sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None    => readCorpus(spark, dir, schema)
    }
    val adjudicated = read(dlDir, dlSchema).select(col("doc_id")).distinct()
    val fresh = batch.join(adjudicated, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    val idxExisting = read(indexDir, idxSchema)
      .select(col("doc_id")).distinct()
    append(graft.operators.TextRank.termIndex(fresh)
      .join(idxExisting, Seq("doc_id"), "left_anti"), indexDir)
    append(graft.operators.TextRank.docLengths(fresh), dlDir)
  }

  /** Incremental IVF-PQ INDEX maintenance — the vector companion of
    * [[indexDocBatch]]: encode each micro-batch's vectors under a FROZEN
    * [[graft.operators.Similarity.PqModel]] and append the slim
    * `(vec_id, cid, codes)` rows to a persisted index, so
    * [[graft.operators.Similarity.knnIvfPqOnIndex]] searches an
    * always-current corpus without EVER re-encoding it (pqIndex was
    * rebuild-only before — a streaming vector corpus re-encoded
    * everything to stay searchable). Compose after [[curateVectorBatch]]
    * in the same foreachBatch to index exactly the curated survivors.
    *
    * Crash idempotence is [[indexDocBatch]]'s ordering: the codes
    * relation anti-joins on its own stored ids, and the bare-id
    * adjudication relation — appended LAST — is what replays check. A
    * crash between the appends leaves codes without adjudication; the
    * replay re-enters the vector (not adjudicated), skips its
    * already-present codes rows, and completes the adjudication append.
    * The reverse order would adjudicate vectors whose codes never landed
    * — invisible to every future search, unrepairable.
    *
    * The model itself persists once via
    * [[graft.operators.Similarity.savePqModel]]; codes are only
    * comparable under the model that produced them, so retraining means
    * reindexing (drop both relations and replay).
    */
  def indexVecBatch(spark: SparkSession, batch: DataFrame,
      model: graft.operators.Similarity.PqModel,
      codesDir: String, adjDir: String,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): Unit = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField,
      StructType}
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val idType = batch.schema("vec_id").dataType
    val codesSchema = StructType(Seq(StructField("vec_id", idType),
      StructField("cid", IntegerType),
      StructField("codes", ArrayType(IntegerType))))
    val adjSchema = StructType(Seq(StructField("vec_id", idType)))
    def read(dir: String, schema: StructType): DataFrame = sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None    => readCorpus(spark, dir, schema)
    }
    val adjudicated = read(adjDir, adjSchema).select(col("vec_id")).distinct()
    val fresh = batch.join(adjudicated, Seq("vec_id"), "left_anti")
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    val codesExisting = read(codesDir, codesSchema)
      .select(col("vec_id")).distinct()
    append(graft.operators.Similarity.pqIndexRows(fresh, model)
      .join(codesExisting, Seq("vec_id"), "left_anti"), codesDir)
    append(fresh.select(col("vec_id")), adjDir)
  }

  /** Incremental CLASSIFIER training — the labeled-data companion of
    * [[indexDocBatch]]: append each micro-batch's per-doc bucket
    * contributions (`Classifier.bucketContribs` — the token-expensive
    * half of training) so the `(bucket, weight)` model derives from one
    * slim aggregate over the stored relation
    * (`Classifier.weightsFromContribs`) — always-current, the corpus
    * never re-tokenized, and new labeled data (quality raters, updated
    * seed sets) folds in per batch instead of forcing a full retrain
    * scan. Same crash ordering: contributions anti-join their own
    * stored doc ids; the bare-id adjudication relation appends LAST.
    */
  def trainDocBatch(spark: SparkSession, batch: DataFrame,
      contribsDir: String, adjDir: String, nBuckets: Int = 4096,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): Unit = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    if (batch.isEmpty) return
    def append(df: DataFrame, dir: String): Unit = sink match {
      case Some(s) => s.append(df, dir, None)
      case None    => df.write.mode("append").parquet(dir)
    }
    val idType = batch.schema("doc_id").dataType
    val contribsSchema = StructType(Seq(StructField("doc_id", idType),
      StructField("y", LongType), StructField("bucket", LongType),
      StructField("occ", LongType)))
    val adjSchema = StructType(Seq(StructField("doc_id", idType)))
    def read(dir: String, schema: StructType): DataFrame = sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None    => readCorpus(spark, dir, schema)
    }
    val adjudicated = read(adjDir, adjSchema).select(col("doc_id")).distinct()
    val fresh = batch.join(adjudicated, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    if (fresh.isEmpty) return
    val existing = read(contribsDir, contribsSchema)
      .select(col("doc_id")).distinct()
    append(graft.operators.Classifier.bucketContribs(fresh, nBuckets)
      .join(existing, Seq("doc_id"), "left_anti"), contribsDir)
    append(fresh.select(col("doc_id")), adjDir)
  }

  /** The stored contributions relation [[trainDocBatch]] maintains,
    * gated on adjudication (crash debris excluded until a replay
    * completes it) — feed to `Classifier.weightsFromContribs`.
    */
  def readContribs(spark: SparkSession, contribsDir: String,
      adjDir: String,
      idType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val contribsSchema = StructType(Seq(StructField("doc_id", idType),
      StructField("y", LongType), StructField("bucket", LongType),
      StructField("occ", LongType)))
    val adjSchema = StructType(Seq(StructField("doc_id", idType)))
    def read(dir: String, schema: StructType): DataFrame = sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None    => readCorpus(spark, dir, schema)
    }
    read(contribsDir, contribsSchema)
      .join(read(adjDir, adjSchema).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
  }

  /** The persisted codes relation [[indexVecBatch]] maintains, gated on
    * adjudication (crash debris — codes whose adjudication append never
    * landed — is excluded until a replay completes it).
    */
  def readPqIndex(spark: SparkSession, codesDir: String, adjDir: String,
      idType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType,
      sink: Option[graft.ingest.Ingest.DestinationSink] = None): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField,
      StructType}
    val codesSchema = StructType(Seq(StructField("vec_id", idType),
      StructField("cid", IntegerType),
      StructField("codes", ArrayType(IntegerType))))
    val adjSchema = StructType(Seq(StructField("vec_id", idType)))
    def read(dir: String, schema: StructType): DataFrame = sink match {
      case Some(s) => readVia(spark, s, dir, schema)
      case None    => readCorpus(spark, dir, schema)
    }
    read(codesDir, codesSchema)
      .join(read(adjDir, adjSchema).select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_semi")
  }

  /** Watermarked tumbling-window aggregate over a streaming frame — the
    * per-day/per-key channel statistics the reference delegates to the
    * warehouse, expressed as a stream (SURVEY §2.9 "not required for
    * parity", provided as the streaming-analytics surface).
    */
  def windowedChannelStats(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_value"),
        avg(col(valueCol)).as("avg_value"))

  /** STREAMING UPSERT sink: every micro-batch merges into a manifest
    * table by key ([[graft.ingest.ManifestSink.mergeInto]]) — the CDC
    * tail of a pipeline, giving last-write-wins per key across batches
    * with each batch one atomic snapshot. foreachBatch's at-least-once
    * redelivery is absorbed structurally: re-merging identical rows
    * replaces them with themselves, so a replayed batch is a content
    * no-op (the idempotency spec drives this). Batches must be
    * key-unique — merge refuses duplicates rather than pick an
    * arbitrary winner; dedupe upstream with `dropDuplicates` ordered by
    * a version column if the source can repeat keys in one batch.
    *
    * `deleteFilter` turns the sink into a full CDC tail
    * ([[graft.ingest.ManifestSink.mergeCdc]]): batch rows satisfying it
    * are delete directives — matched keys are removed, unmatched
    * deletes are no-ops, and replayed deletes stay no-ops (the key is
    * already gone), preserving the idempotence argument.
    *
    * FAILS LOUDLY when a merge does not apply: [[graft.ingest
    * .ManifestSink.mergeIntoStatus]] distinguishes a committed batch
    * (and the benign content no-op) from a merge that REFUSED to run —
    * a pending staged attempt from a crashed writer, or a concurrent
    * writer advancing the log mid-merge. Those raise, so foreachBatch
    * fails, the CHECKPOINT DOES NOT ADVANCE, and Structured Streaming
    * retries the same batch on restart — without this the sink would
    * report success on a merge that returned without committing and
    * the micro-batch would be permanently lost (worst case: one stale
    * staging dir silently dropping EVERY subsequent batch). A pending-
    * attempt failure names the fix: run `ManifestSink.recover` (after
    * confirming no live writer), then restart the stream.
    */
  def upsertStream(src: DataFrame, destPath: String, keyCol: String,
      statsCols: Seq[String] = Nil,
      checkpointDir: Option[String] = None,
      deleteFilter: Option[org.apache.spark.sql.Column] = None,
      directiveCols: Seq[String] = Nil,
      mor: Boolean = false): StreamingQuery = {
    var w = src.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ingest.ManifestSink
        // mor = true keeps the destination a pure append+dv log, so
        // every micro-batch stays decomposable by changeFeedStream —
        // the bronze table of a medallion pipeline
        val outcome = deleteFilter match {
          case Some(f) =>
            ManifestSink.mergeCdcStatus(batch.sparkSession,
              destPath, batch.toDF(), keyCol, f,
              directiveCols = directiveCols, statsCols = statsCols,
              mor = mor)
          case None =>
            ManifestSink.mergeIntoStatus(batch.sparkSession,
              destPath, batch.toDF(), keyCol, statsCols = statsCols,
              mor = mor)
        }
        outcome match {
          case ManifestSink.MergeOutcome.Skipped =>
            throw new IllegalStateException(
              s"[graft] upsertStream batch $batchId did NOT merge " +
                s"into $destPath: a staged attempt is pending (crashed " +
                "writer?). Run ManifestSink.recover after confirming " +
                "no live writer, then restart the stream — the batch " +
                "will be retried from the checkpoint.")
          case ManifestSink.MergeOutcome.Aborted =>
            throw new IllegalStateException(
              s"[graft] upsertStream batch $batchId aborted merging " +
                s"into $destPath: a concurrent writer advanced the " +
                "log. Restart the stream to retry the batch.")
          case _ => ()
        }
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }

  /** STREAMING CDC SOURCE: tail a manifest table's log, emitting each
    * APPEND version's rows exactly once across restarts. One call
    * DRAINS everything committed since the checkpoint and stops — the
    * `Trigger.AvailableNow` cadence this module standardizes on; run
    * it under a scheduler (or a loop) for a continuous tail. Returns
    * the versions emitted this call.
    *
    * Contract:
    *  - checkpoint = last version seen, one durable file under
    *    `checkpointDir`, atomically replaced AFTER `process` returns
    *    for a version — a crash between the two replays that version,
    *    so `process` must be idempotent per version id (it receives
    *    the version, the foreachBatch batchId discipline);
    *  - LAYOUT snapshots (optimize/compact) are skipped without
    *    emission and the checkpoint advances past them — a mid-stream
    *    compaction neither duplicates nor drops;
    *  - CONTENT-changing commits in the range (COW rewrites, merges,
    *    deletion vectors, restores, partition drops) throw: an
    *    append-only tail cannot represent them — re-sync from a full
    *    [[graft.ingest.ManifestSink.readBack]];
    *  - a checkpoint below the surviving floor (history compacted
    *    past it while the tail was down) throws as compacted-away,
    *    exactly like the batch [[graft.ingest.ManifestSink
    *    .readAppendsBetween]].
    *
    * Scale shape: a poll is O(surviving manifests) driver metadata +
    * exactly the NEW files' bytes — never a table scan, never a diff.
    */
  /** Durable last-emitted-version checkpoint for the CDC tails. Each
    * advance WRITES A NEW FILE `last_version.<v>` — no rename, no
    * delete-then-replace — and readers take the max suffix, so a crash
    * at ANY instruction leaves a valid checkpoint: either only the old
    * file (replay one version — the documented at-least-once-per-
    * version window) or both (max wins, exactly-once). The former
    * delete-then-rename pair had a window with NO checkpoint at all —
    * a crash inside it replayed the ENTIRE surviving history on
    * restart — and its fixed `.last_version_tmp` name raced two tails
    * sharing a checkpointDir. Versioned names have neither problem:
    * concurrent tails write byte-identical content per version. Old
    * versions are swept best-effort after each advance; the legacy
    * single `last_version` file is still read for pre-existing
    * checkpoints.
    */
  private def readVersionCkpt(fs: org.apache.hadoop.fs.FileSystem,
      checkpointDir: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    if (!fs.exists(dir)) return -1L
    val versioned = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("last_version."))
      .flatMap(n => n.stripPrefix("last_version.").toLongOption)
    if (versioned.nonEmpty) versioned.max
    else {
      val legacy = new org.apache.hadoop.fs.Path(dir, "last_version")
      if (!fs.exists(legacy)) -1L
      else {
        val in = fs.open(legacy)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          .trim.toLong
        finally in.close()
      }
    }
  }

  private def writeVersionCkpt(fs: org.apache.hadoop.fs.FileSystem,
      checkpointDir: String, v: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    fs.mkdirs(dir)
    val p = new org.apache.hadoop.fs.Path(dir, s"last_version.$v")
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // sweep superseded checkpoints (and the legacy file) best-effort —
    // a failure here costs one extra file, never correctness
    try {
      fs.listStatus(dir).map(_.getPath).foreach { old =>
        val n = old.getName
        val isOlder = n.startsWith("last_version.") &&
          n.stripPrefix("last_version.").toLongOption.exists(_ < v)
        if (isOlder || n == "last_version") fs.delete(old, false)
      }
    } catch { case _: Exception => () }
  }

  def changesStream(spark: SparkSession, destPath: String,
      checkpointDir: String)
      (process: (DataFrame, Long) => Unit): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readCkpt(): Long = readVersionCkpt(fs, checkpointDir)
    def writeCkpt(v: Long): Unit = writeVersionCkpt(fs, checkpointDir, v)
    val since = readCkpt()
    val (feed, head) =
      graft.ingest.ManifestSink.appendFeed(spark, destPath, since)
    val emitted = feed.map { case (v, thunk) =>
      process(thunk(), v)
      writeCkpt(v)
      v
    }
    // advance past trailing layout snapshots so a later compact cannot
    // strand the checkpoint below the surviving floor
    if (head > emitted.lastOption.getOrElse(since)) writeCkpt(head)
    println(s"METRIC graft.changes.emitted=${emitted.length} " +
      s"head=$head dest=$destPath")
    emitted
  }

  /** [[changesStream]] for tables that take MERGE-ON-READ writes: one
    * poll of the ROW-LEVEL change feed
    * ([[graft.ingest.ManifestSink.readChangesBetween]]'s per-version
    * form). Each content-carrying version since the durable checkpoint
    * is handed to `process` ONCE as `(changes, version)` — inserts AND
    * delete pre-images, tagged `_change_type`/`_commit_version` — and
    * the checkpoint advances only after `process` returns, so a crash
    * mid-version replays exactly that version (at-least-once per
    * version; idempotent consumers key on `_commit_version`). Layout
    * snapshots advance the checkpoint silently; COW/restore commits in
    * the range refuse loudly — keep the table's change traffic
    * `mor = true` for a tailable feed. Returns the versions emitted.
    */
  def changeFeedStream(spark: SparkSession, destPath: String,
      checkpointDir: String)
      (process: (DataFrame, Long) => Unit): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readCkpt(): Long = readVersionCkpt(fs, checkpointDir)
    def writeCkpt(v: Long): Unit = writeVersionCkpt(fs, checkpointDir, v)
    val since = readCkpt()
    val (feed, head) =
      graft.ingest.ManifestSink.changeFeed(spark, destPath, since)
    val emitted = feed.map { case (v, thunk) =>
      process(thunk(), v)
      writeCkpt(v)
      v
    }
    if (head > emitted.lastOption.getOrElse(since)) writeCkpt(head)
    println(s"METRIC graft.changefeed.emitted=${emitted.length} " +
      s"head=$head dest=$destPath")
    emitted
  }

  /** STREAM-STREAM interval join — the streaming face of
    * [[graft.operators.IntervalJoin]]: inner-join two event streams on
    * a key, keeping right events inside `[left time, left time +
    * window]` (inclusive; the click→conversion attribution shape).
    * Both sides carry watermarks and the join condition carries the
    * event-time range, which is exactly what Spark's symmetric hash
    * join needs to BOUND its state: a buffered left row is evicted once
    * the right watermark passes its window end, and right input older
    * than the watermark is filtered before it can re-match — without
    * the range the state grows with the stream forever. Append-mode
    * output; column sets must be disjoint (alias before joining).
    *
    * `joinType = "left_outer"` emits the unattributed-left row (right
    * side NULL) — but only once the right watermark has passed the
    * row's window end, because until then a match could still arrive;
    * the "clicks that never converted" report with no false negatives.
    */
  def streamIntervalJoin(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String,
      delay: String, window: String,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"[graft] streamIntervalJoin: joinType must be inner or " +
        s"left_outer (state bounding requires the left side to carry " +
        s"the range), got '$joinType'")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"[graft] streamIntervalJoin column collision on " +
        s"${shared.mkString(",")} — alias one side before joining")
    left.withWatermark(lTime, delay)
      .join(right.withWatermark(rTime, delay),
        col(lKey) === col(rKey) &&
          col(rTime) >= col(lTime) &&
          col(rTime) <= col(lTime) + expr(s"INTERVAL $window"),
        joinType)
  }
}
