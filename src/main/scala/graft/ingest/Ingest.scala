package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ledger.Ledger
import graft.model.Task
import graft.schema.SchemaEvolution

/** The ingest pipeline: the reference's whole lifecycle
  * (index.js:15–99 `loadCreatedFiles`) re-expressed as Spark batch ETL.
  *
  * Per task: list+glob candidate files (P2) → anti-join the ledger (J1) →
  * sniff headers (S2) → evolve the destination schema (right-append floats,
  * SO2) → one permissive multi-file CSV read (S3; the multi-URI load job) →
  * append to the DAY-partitioned destination (S4) → append the ledger (S5).
  *
  * Stages up to the read are driver-side planning over file *metadata*; the
  * read/write is the only distributed work. One `csv(paths:_*)` read
  * amortizes scheduling over the whole batch exactly like the reference
  * packs many sourceUris into one load job (BucketToBigQuery.js:340) — and
  * Spark has no 10k-files-per-job limit.
  */
object Ingest {

  /** Recursively list files under `root` and keep those matching any task
    * glob. Listing is a metadata operation (no data read); at cluster scale
    * the listing itself is parallelized by Spark's InMemoryFileIndex when
    * the paths go straight into `spark.read`, but we need the explicit list
    * for the ledger anti-join, mirroring the reference's event-URI stream.
    */
  def listCandidates(
      spark: SparkSession, root: String, globs: Seq[String]): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    val it = fs.listFiles(rootPath, /*recursive=*/ true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      if (Glob.matchesAny(globs, p) ||
          Glob.matchesAny(globs, st.getPath.toString)) out += st.getPath.toString
    }
    out.toSeq.sorted
  }

  /** CSV read with the reference load-job contract
    * (BucketToBigQuery.js:329–349):
    *  - `skipLeadingRows:1`      → header=true
    *  - `allowJaggedRows:true`   → PERMISSIVE mode null-pads short rows
    *  - `allowQuotedNewlines`    → multiLine=true
    *  - `ignoreUnknownValues`    → extra trailing cells tolerated
    *  - `maxBadRecords:0`        → structurally corrupt rows are surfaced
    *    via a corrupt-record column the caller may assert empty.
    */
  def readCsv(
      spark: SparkSession, schema: StructType, uris: Seq[String],
      strict: Boolean = true): DataFrame = {
    val corrupt = "_graft_corrupt"
    val readSchema = StructType(schema.fields :+
      StructField(corrupt, org.apache.spark.sql.types.StringType))
    val df = spark.read
      .schema(readSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("enforceSchema", "true")
      .option("columnNameOfCorruptRecord", corrupt)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(uris: _*)
    if (!strict) df.drop(corrupt)
    else {
      // maxBadRecords:0 contract (reference BucketToBigQuery.js:339) with
      // the allowJaggedRows + ignoreUnknownValues carve-outs: Spark marks
      // short rows, long rows AND garbage rows all as corrupt. A corrupt
      // row is BAD (fails the load) iff
      //  - its first declared field is unparseable — even a short row
      //    must lead with valid data; or
      //  - it is structurally FULL (cell count >= declared fields) AND
      //    some declared field is still null — a type error inside a
      //    complete row is real corruption. A full corrupt row with every
      //    field parsed is the extra-trailing-cells case
      //    (ignoreUnknownValues) and passes.
      // Short rows with parseable leading cells pass (allowJaggedRows).
      // The cell count is a delimiter split of the raw record with quoted
      // sections blanked first, so a quoted comma inside a short jagged
      // row does not inflate the count past the schema width.
      // The raise_error is woven into the FIRST OUTPUT column (a dropped
      // guard column would be pruned away and never evaluate); it fails
      // the load on the first bad row during the single write pass.
      val f0 = schema.fields.head
      val cells = size(split(
        regexp_replace(col(corrupt), "\"[^\"]*\"", "Q"), ","))
      val structurallyFull = cells >= schema.fields.length
      val someFieldNull = schema.fields
        .map(f => col(f.name).isNull)
        .reduce(_ || _)
      val checked = when(
        col(corrupt).isNotNull &&
          (col(f0.name).isNull || (structurallyFull && someFieldNull)),
        raise_error(concat(lit("[graft] maxBadRecords=0: corrupt row: "),
          col(corrupt))).cast(f0.dataType))
        .otherwise(col(f0.name)).as(f0.name)
      df.select(checked +: schema.fields.tail.map(f => col(f.name)): _*)
    }
  }

  /** Align a frame to the (possibly wider) destination schema: pad missing
    * trailing columns with typed nulls; never reorder (readme.md:25).
    */
  def alignTo(df: DataFrame, dest: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols = dest.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  private def destExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Current destination schema if the table exists (minus the partition
    * directory column we add on write).
    */
  def destSchema(spark: SparkSession, destPath: String): Option[StructType] =
    if (!destExists(spark, destPath)) None
    else Some(StructType(spark.read.parquet(destPath)
      .schema.fields.filterNot(_.name == PartitionCol)))

  /** Name of the derived DAY-partition directory column (the reference uses
    * BigQuery DAY time-partitioning on the field itself,
    * BucketToBigQuery.js:350–354; on parquet we materialize the date).
    */
  val PartitionCol = "p_date"

  /** Destination abstraction — the reference's destination is a managed
    * warehouse table (BucketToBigQuery.js:341–354); ours defaults to a
    * DAY-partitioned parquet layout, but a BigQuery-connector, Delta or
    * Iceberg sink drops in here without touching the pipeline: `loadTask`
    * only ever calls [[append]] after planning and [[readBack]] for the
    * row-count metric.
    */
  trait DestinationSink {
    /** Append `df` to `destPath`, partitioned by `partitionField`'s DAY
      * when present. MUST be atomic-or-append-only per call: the ledger is
      * written only after this returns (ST5 fix).
      */
    def append(df: DataFrame, destPath: String,
        partitionField: Option[String]): Unit
    /** Read the destination back (schema-reconciling across old narrow and
      * new wide files).
      */
    def readBack(spark: SparkSession, destPath: String): DataFrame
  }

  /** Default sink: DAY-partitioned parquet directories. */
  object ParquetSink extends DestinationSink {
    override def append(df: DataFrame, destPath: String,
        partitionField: Option[String]): Unit = {
      val writer = partitionField match {
        case Some(f) =>
          df.withColumn(PartitionCol, to_date(col(f)))
            .write.mode("append").partitionBy(PartitionCol)
        case None => df.write.mode("append")
      }
      writer.parquet(destPath)
    }
    override def readBack(spark: SparkSession, destPath: String): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(destPath)
  }

  final case class LoadResult(
      destPath: String,
      loadedFiles: Seq[String],
      schema: StructType,
      partitionField: Option[String],
      rows: Long)

  /** The planning product — everything `loadTask` decides before touching
    * data. Returned verbatim by [[planTask]] (the reference's DRY_RUN
    * surface, index.js:79-80: print the generated load-job config instead
    * of executing it).
    */
  final case class LoadPlan(
      jobId: String,
      destPath: String,
      ledgerPath: String,
      files: Seq[String],
      schema: StructType,
      partitionField: Option[String]) {
    def render: String =
      s"""jobId:     $jobId
         |dest:      $destPath
         |ledger:    $ledgerPath
         |partition: ${partitionField.getOrElse("(none)")}
         |schema:    ${schema.fields.map(f =>
               s"${f.name}:${f.dataType.simpleString}").mkString(", ")}
         |files:     ${files.mkString("\n           ")}""".stripMargin
  }

  /** Deterministic job id: prefix + UTC stamp + task table (24-hour clock;
    * the reference's 12-hour `hh` stamp, BucketToBigQuery.js:225, is a
    * documented quirk we do not reproduce — ids are identifiers, not
    * behavior).
    */
  def jobId(task: Task, prefix: String = "graft__"): String =
    prefix + java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmssSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now()) + "_" + task.table

  /** Plan from an explicit candidate list (the shared tail of listing- and
    * notification-driven discovery): ledger-filter, sniff, evolve, infer
    * partition — no data read beyond the 4 KB header probes, no writes.
    */
  def planFromCandidates(
      spark: SparkSession, task: Task,
      candidates: Seq[String], warehouseRoot: String): LoadPlan = {
    val destPath = s"$warehouseRoot/${task.dataset}/${task.table}"
    val ledgerPath = s"$warehouseRoot/${task.dataset}/${task.ledgerTable}"
    val conf = spark.sparkContext.hadoopConfiguration

    // 1. candidates (P2) minus ledger (J1)
    val files = Ledger.filterNew(spark, ledgerPath, candidates)
    if (files.isEmpty)
      return LoadPlan(jobId(task), destPath, ledgerPath, Nil,
        destSchema(spark, destPath).getOrElse(task.declaredSchema), None)

    // 2. sniff (S2) + evolve (SO2): longest of first/last file headers
    val headers = CsvSniffer.longestHeaders(conf, files)
    val base = destSchema(spark, destPath).getOrElse(task.declaredSchema)
    val evolved = SchemaEvolution.sniffedSchema(base, headers)

    // 3. partition field: explicit > inferred over first 5 (F1)
    val partField = SchemaEvolution.effectivePartitionField(
      task.timePartitioningField, task.timePartitioningFieldSet, evolved)
    LoadPlan(jobId(task), destPath, ledgerPath, files, evolved, partField)
  }

  /** Planning only, listing-driven discovery — candidates come from a
    * recursive listing of `sourceRoot` (O(bucket); see
    * [[graft.ingest.NotificationIngest]] for the O(new files) path).
    */
  def planTask(
      spark: SparkSession, task: Task,
      sourceRoot: String, warehouseRoot: String): LoadPlan =
    planFromCandidates(spark, task,
      listCandidates(spark, sourceRoot, task.sources), warehouseRoot)

  /** Execute a plan: one multi-file read, one partitioned append, ledger
    * AFTER the write action returns (fixes reference quirk ST5 where files
    * were ledgered before their load job completed,
    * BucketToBigQuery.js:361–374).
    */
  def executePlan(
      spark: SparkSession, plan: LoadPlan,
      sink: DestinationSink = ParquetSink): LoadResult = {
    if (plan.files.isEmpty)
      return LoadResult(plan.destPath, Nil, plan.schema, None, 0L)

    // 4. the distributed part: one multi-file read, one partitioned write
    val df = alignTo(readCsv(spark, plan.schema, plan.files), plan.schema)
    sink.append(df, plan.destPath, plan.partitionField)

    // 5. ledger AFTER the write action returns (ST5)
    Ledger.markImported(spark, plan.ledgerPath, plan.files)

    val rows = sink.readBack(spark, plan.destPath).count()
    // metric log lines, the reference's observability surface
    // (`METRIC B2BQ.*`, index.js:55-98)
    println(s"METRIC graft.files_loaded=${plan.files.length} " +
      s"graft.rows_total=$rows job=${plan.jobId}")
    LoadResult(plan.destPath, plan.files, plan.schema,
      plan.partitionField, rows)
  }

  /** Run one task end-to-end. `sourceRoot` is the storage root the globs
    * apply under; `warehouseRoot` is where `<dataset>/<table>` lives.
    */
  def loadTask(
      spark: SparkSession, task: Task,
      sourceRoot: String, warehouseRoot: String,
      sink: DestinationSink = ParquetSink): LoadResult =
    executePlan(spark, planTask(spark, task, sourceRoot, warehouseRoot), sink)

  /** Read a destination table back, reconciling old narrow files with the
    * evolved wide schema (parquet mergeSchema).
    */
  def readDest(spark: SparkSession, destPath: String): DataFrame =
    ParquetSink.readBack(spark, destPath)
}
