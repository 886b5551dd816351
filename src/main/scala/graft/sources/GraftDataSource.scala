package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression, Literal, Predicate => CatalystPredicate}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEqualTo, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, InSet => CInSet, IsNotNull => CIsNotNull, IsNull => CIsNull, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Or => COr}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.ManifestSink
import graft.ingest.ManifestSink.SkipPredicate

/** `spark.read.format("graft").load(dest)` — the SQL face of a manifest
  * table. Until this existed, the engine's one wrong-data exposure was a
  * user issuing plain `spark.read.parquet(dest)` over a destination
  * directory: that listing sees superseded, uncommitted, and tombstoned
  * files (the reference's whole pitch is "query the warehouse normally",
  * readme.md:38–46). This source closes it Spark-first — no custom scan
  * operator, no reimplemented parquet reader:
  *
  *  - [[GraftFileIndex]] (a `FileIndex`) resolves the COMMITTED snapshot
  *    through [[ManifestSink.snapshotHandle]] and answers Catalyst's
  *    `listFiles(partitionFilters, dataFilters)` with manifest-stats +
  *    bloom pruning — the same `SkipPredicate` decision the Scala read
  *    paths use, now driven by SQL WHERE clauses. File skipping becomes
  *    a *planning-time metadata decision* for any SQL/BI client.
  *  - The relation is a stock `HadoopFsRelation` over
  *    `ParquetFileFormat`: whole-stage codegen, vectorized reading,
  *    parquet row-group pushdown, and partition pruning all arrive free
  *    from Catalyst. A table with no deletion vectors plans the
  *    byte-identical scan a hand-built `spark.read.parquet` of the live
  *    files would.
  *  - Deletion vectors apply INSIDE the scan via
  *    [[GraftParquetFileFormat]] (the Delta `DeltaParquetFileFormat`
  *    shape), so correctness does not depend on session extensions or
  *    wrapper APIs: tombstoned rows are filtered by file position in
  *    the reader itself.
  *
  * Options: `versionAsOf` / `timestampAsOf` (time travel, the
  * [[ManifestSink.readVersion]]/[[ManifestSink.readAsOf]] contracts);
  * write-side `partitionField`, `statsCols`, `bloomCols` (comma
  * separated) route `df.write.format("graft")` through the staged
  * atomic commit. `CREATE TABLE t USING graft LOCATION ...` registers
  * the table in the session catalog; `spark.sql("SELECT ... FROM t")`
  * then plans through the same pruned scan.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "[graft] format(\"graft\") requires a path — .load(dest) or " +
        "LOCATION"))

  private def rowLevelOf(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("feed", "appends") match {
      case "appends" => false
      case "changes" => true
      case other => throw new IllegalArgumentException(
        s"[graft] feed must be 'appends' or 'changes', got '$other'")
    }

  // ---- streaming face: spark.readStream.format("graft") ----------
  // (see [[GraftStreamSource]] — offsets are manifest versions)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(GraftStreamSource.schemaFor(
      sqlContext.sparkSession, pathOf(parameters),
      rowLevelOf(parameters))))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val spark = sqlContext.sparkSession
    val destPath = pathOf(parameters)
    new GraftStreamSource(spark, destPath, rowLevelOf(parameters),
      GraftStreamSource.resolveStartingVersion(spark, destPath,
        parameters.get("startingVersion")),
      schema,
      parameters.get("maxVersionsPerTrigger").map(_.toInt)
        .getOrElse(GraftStreamSource.DefaultMaxVersions))
  }

  // ---- streaming sink: df.writeStream.format("graft") -------------
  // (see [[GraftStreamSink]] — exactly-once via deterministic
  // writeIds over the idempotent commit protocol)

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val destPath = pathOf(parameters)
    val mergeKey = parameters.get("mergeKey")
    val append = org.apache.spark.sql.streaming.OutputMode.Append()
    val update = org.apache.spark.sql.streaming.OutputMode.Update()
    if (mergeKey.isEmpty && outputMode != append)
      throw new IllegalArgumentException(
        s"[graft] sink: output mode $outputMode needs a mergeKey — " +
          "plain appends are Append-mode only")
    if (outputMode != append && outputMode != update)
      throw new IllegalArgumentException(
        s"[graft] sink: unsupported output mode $outputMode")
    if (partitionColumns.nonEmpty)
      throw new IllegalArgumentException(
        "[graft] sink: use option(\"partitionField\", col) — " +
          "partitionBy() does not reach the manifest layout")
    def csv(key: String): Seq[String] = parameters.get(key)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new GraftStreamSink(destPath, parameters.get("partitionField"),
      csv("statsCols"), csv("bloomCols"), mergeKey,
      parameters.get("mor").exists(_.toBoolean),
      parameters.get("checkpointLocation"))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val destPath = pathOf(parameters)
    val handle = ManifestSink.snapshotHandle(spark, destPath,
      parameters.get("versionAsOf").map(_.toLong),
      parameters.get("timestampAsOf").map(_.toLong))
    GraftDataSource.relationFor(spark, handle)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val destPath = pathOf(parameters)
    val partitionField = parameters.get("partitionField")
    val statsCols = parameters.get("statsCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val bloomCols = parameters.get("bloomCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val exists =
      ManifestSink.snapshotHandle(spark, destPath).targets.nonEmpty
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"[graft] $destPath already has committed data " +
            "(SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => // no-op
      case SaveMode.Overwrite =>
        // atomic snapshot-replace: one commit flips readers to the new
        // content, history retained (time travel/RESTORE reach the
        // pre-overwrite state), concurrent commits abort it loudly
        ManifestSink.overwrite(data, destPath, partitionField,
          if (statsCols.nonEmpty) statsCols else bloomCols, bloomCols,
          overwriteSchema = parameters.get("overwriteSchema")
            .exists(_.toBoolean))
      case _ => // Append, or first write under ErrorIfExists/Ignore
        if (statsCols.nonEmpty || bloomCols.nonEmpty)
          ManifestSink.statsAppend(data, destPath, partitionField,
            if (statsCols.nonEmpty) statsCols
            else bloomCols, // statsAppend requires non-empty statsCols
            bloomCols = bloomCols)
        else ManifestSink.append(data, destPath, partitionField)
    }
    GraftDataSource.relationFor(spark,
      ManifestSink.snapshotHandle(spark, destPath))
  }
}

object GraftDataSource {

  /** Build the committed-snapshot relation: resolve schemas from the
    * committed files' footers (mergeSchema — the prefix/superset
    * evolution contract), derive the partition layout from the target
    * paths, and pick the file format by dv presence.
    */
  private[graft] def relationFor(spark: SparkSession,
      handle: ManifestSink.SnapshotHandle): BaseRelation = {
    val index = new GraftFileIndex(spark, handle)
    // the schema resolves from the LOG's recorded per-commit schemas
    // (union semantics identical to mergeSchema under the
    // prefix/superset evolution contract) — the footer sweep over
    // every committed file runs only for pre-schema-line logs. At
    // 100k files that sweep is a distributed job per relation
    // resolution; the log read is free.
    val dataSchema: StructType =
      if (handle.targets.isEmpty) StructType(Nil)
      else handle.schemaOpt.getOrElse(
        spark.read.option("mergeSchema", "true")
          .parquet(index.inputFiles.toIndexedSeq: _*).schema)
    // COLUMN MAPPING: the relation surfaces LOGICAL names; the
    // FileFormat requests the PHYSICAL (file) names per column and
    // translates pushed-down filters (GraftParquetFileFormat.toPhys /
    // mapFilter). Never-renamed tables have an empty map and take the
    // plain ParquetFileFormat path unchanged. The surfaced schema is
    // STRIPPED of the mapping metadata — a CTAS-style copy of this
    // relation into a new table must not smuggle a bogus mapping into
    // the new table's footers (the renamed column would read NULL
    // there).
    val renameMap: Map[String, String] =
      handle.schemaOpt.map(ManifestSink.mappingOf).getOrElse(Map.empty)
    val fileFormat =
      if (handle.dvs.isEmpty && renameMap.isEmpty) new ParquetFileFormat
      else new GraftParquetFileFormat(
        if (handle.dvs.isEmpty) GraftParquetFileFormat.NoDv
        else GraftParquetFileFormat.dvPositions(spark, handle),
        renameMap)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = ManifestSink.stripPhysical(dataSchema),
      bucketSpec = None,
      fileFormat = fileFormat,
      options = Map("mergeSchema" -> "true"))(spark)
  }
}

/** The committed file set as a Catalyst `FileIndex`: `listFiles` is
  * where Spark hands a scan its pushed-down filters, so this is where
  * manifest-stats + bloom skipping joins the SQL planner — the same
  * metadata decision as [[ManifestSink.readBackWherePred]], now for
  * every `spark.sql` WHERE clause. Partition directories
  * (`col=value/`) surface as a real partition column with Catalyst
  * partition pruning evaluated here against parsed directory values.
  */
final class GraftFileIndex(spark: SparkSession,
    private[graft] val handle: ManifestSink.SnapshotHandle)
    extends FileIndex {

  private val destPath = new Path(handle.destPath)
  private val fs = destPath.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** (relative target, FileStatus, partition segment values by column).
    * Statuses come from the manifest's recorded per-file sizes — the
    * log IS the metadata, so building the index costs ZERO stat RPCs
    * for files committed with `fsize` lines (at 100k files on an
    * object store, the difference between a log read and minutes of
    * driver HEAD calls). Pre-fsize files fall back to one
    * getFileStatus each; the snapshot is immutable either way, so no
    * re-listing per query.
    */
  private val entries: Seq[(String, FileStatus, Map[String, String])] = {
    val sizes = handle.sizes
    val blockSize = fs.getDefaultBlockSize(destPath)
    // pre-fsize files (legacy logs) fall back to the filesystem — ONE
    // bulk listStatus per DISTINCT parent directory instead of one
    // driver getFileStatus per file (at 100k object-store files the
    // difference between a handful of LIST calls and minutes of HEADs)
    val missing = handle.targets.filterNot(sizes.contains)
    val listed: Map[String, FileStatus] =
      if (missing.isEmpty) Map.empty
      else {
        if (missing.length > 1)
          println(s"METRIC graft.fileindex.legacy_stat_files=" +
            s"${missing.length} dest=${handle.destPath}")
        missing.map { rel =>
          val i = rel.lastIndexOf('/')
          if (i < 0) "" else rel.substring(0, i)
        }.distinct.flatMap { dir =>
          val d = if (dir.isEmpty) destPath else new Path(destPath, dir)
          val prefix = if (dir.isEmpty) "" else dir + "/"
          try fs.listStatus(d).toSeq
            .filter(_.isFile)
            .map(st => (prefix + st.getPath.getName) -> st)
          catch { case _: java.io.FileNotFoundException => Nil }
        }.toMap
      }
    handle.targets.map { rel =>
      val p = fs.makeQualified(new Path(destPath, rel))
      val st = sizes.get(rel) match {
        case Some((len, mtime)) =>
          new FileStatus(len, false, 1, blockSize, mtime, p)
        case None => listed.getOrElse(rel, fs.getFileStatus(p))
      }
      // hive-UNESCAPE the directory value (a generic partition value
      // like "a:b" lands as "a%3Ab"; the derived date/hour values
      // never escape, so this is the identity for them) — Spark's own
      // partition discovery does the same
      val parts = rel.split('/').init.collect {
        case seg if seg.contains('=') =>
          val i = seg.indexOf('=')
          seg.substring(0, i) ->
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.substring(i + 1))
      }.toMap
      (rel, st, parts)
    }
  }

  /** Partition columns in first-seen order; DateType when every value
    * parses as an ISO date (the sink's `to_date` layout), StringType
    * otherwise. `__HIVE_DEFAULT_PARTITION__` is the null marker.
    */
  override val partitionSchema: StructType = {
    val cols = entries.flatMap(_._3.keys).distinct
    StructType(cols.map { c =>
      val vals = entries.flatMap(_._3.get(c))
        .filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
      // type like Spark's own partition-value inference: int before
      // long before date before string — so the p_hour level (and
      // shard dirs) read the SAME type through this index and through
      // plain spark.read.parquet, and an int-range overflow (a shard
      // value beyond 2^31) widens to long instead of failing at
      // lookup time
      val isInt = vals.nonEmpty && vals.forall(v =>
        scala.util.Try(v.toInt).isSuccess)
      val isLong = !isInt && vals.nonEmpty && vals.forall(v =>
        scala.util.Try(v.toLong).isSuccess)
      val isDate = !isInt && !isLong && vals.nonEmpty &&
        vals.forall(v =>
          scala.util.Try(java.time.LocalDate.parse(v)).isSuccess)
      StructField(c,
        if (isInt) IntegerType
        else if (isLong) LongType
        else if (isDate) DateType else StringType,
        nullable = true)
    })
  }

  private def partitionRow(parts: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partitionSchema.map { f =>
      parts.get(f.name) match {
        case None | Some("__HIVE_DEFAULT_PARTITION__") => null
        case Some(v) => f.dataType match {
          case DateType =>
            java.time.LocalDate.parse(v).toEpochDay.toInt
          case IntegerType => v.toInt
          case LongType    => v.toLong
          case _ => UTF8String.fromString(v)
        }
      }
    })

  override def rootPaths: Seq[Path] = Seq(destPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // 1. manifest-stats + bloom skipping from the pushed data filters
    val skip = GraftFilterConversion.toSkipPredicate(dataFilters)
    val kept: Set[String] = skip match {
      case Some(p) => handle.prune(handle.targets, p).toSet
      case None    => handle.targets.toSet
    }
    // 2. partition pruning against parsed directory values
    val bound = partitionFilters.map { e =>
      CatalystPredicate.createInterpreted(e.transform {
        case a: AttributeReference =>
          val i = partitionSchema.indexWhere(_.name == a.name)
          if (i < 0) Literal(true) // non-partition ref: conservative
          else BoundReference(i, partitionSchema(i).dataType,
            partitionSchema(i).nullable)
      })
    }
    val grouped = entries
      .filter { case (rel, _, _) => kept.contains(rel) }
      .groupBy(_._3)
    val dirs = grouped.toSeq.flatMap { case (parts, es) =>
      val row = partitionRow(parts)
      if (bound.forall(_.eval(row)))
        Some(PartitionDirectory(row,
          es.map(e => FileStatusWithMetadata(e._2))))
      else None
    }
    println(s"METRIC graft.sql.skipping files_total=" +
      s"${handle.targets.length} stats_kept=${kept.size} " +
      s"listed=${dirs.map(_.files.length).sum} dest=${handle.destPath}")
    dirs
  }

  override def inputFiles: Array[String] =
    entries.map(e => new Path(destPath, e._1).toString).toArray

  override def refresh(): Unit = () // snapshot semantics: immutable cut

  override def sizeInBytes: Long = entries.map(_._2.getLen).sum
}

/** Catalyst filter → [[SkipPredicate]] conversion — only shapes the
  * stats/bloom metadata can decide (numeric/string compare, IN, null
  * tests, AND/OR). Everything else converts to None and stays a
  * row-level filter; pruning is an OPTIMIZATION, never a semantics
  * change, because Spark re-applies the full filter above the scan.
  */
private[graft] object GraftFilterConversion {
  import SkipPredicate._

  def toSkipPredicate(filters: Seq[Expression]): Option[SkipPredicate] = {
    val converted = filters.flatMap(convert)
    if (converted.isEmpty) None
    else if (converted.length == 1) Some(converted.head)
    else Some(And(converted))
  }

  private def numLit(v: Any): Option[Double] = v match {
    case null => None
    case b: Byte => Some(b.toDouble)
    case s: Short => Some(s.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private def strLit(v: Any): Option[String] = v match {
    case u: UTF8String => Some(u.toString)
    case _ => None
  }

  /** Strict inequalities use inclusive bounds: conservative (a file
    * holding only the boundary value is read and the residual filter
    * drops it) and therefore always correct.
    */
  private def cmp(a: AttributeReference, v: Any, lo: Boolean,
      flipped: Boolean): Option[SkipPredicate] = {
    val isLo = lo != flipped
    numLit(v).map(d =>
        if (isLo) NumRange(a.name, d, Double.PositiveInfinity)
        else NumRange(a.name, Double.NegativeInfinity, d))
      .orElse(strLit(v).map(s =>
        // open bounds stay None: NO string is maximal in UTF-8 byte
        // order (the data/stats order), so any "high" sentinel would
        // mis-prune files whose min sorts above it (emoji keys did,
        // against the old '￿'-pad)
        if (isLo) StrRange(a.name, Some(s), None)
        else StrRange(a.name, None, Some(s))))
  }

  def convert(e: Expression): Option[SkipPredicate] = e match {
    case CEqualTo(a: AttributeReference, Literal(v, _)) => eq(a, v)
    case CEqualTo(Literal(v, _), a: AttributeReference) => eq(a, v)
    case CGreaterThan(a: AttributeReference, Literal(v, _)) =>
      cmp(a, v, lo = true, flipped = false)
    case CGreaterThan(Literal(v, _), a: AttributeReference) =>
      cmp(a, v, lo = true, flipped = true)
    case CGreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      cmp(a, v, lo = true, flipped = false)
    case CGreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      cmp(a, v, lo = true, flipped = true)
    case CLessThan(a: AttributeReference, Literal(v, _)) =>
      cmp(a, v, lo = false, flipped = false)
    case CLessThan(Literal(v, _), a: AttributeReference) =>
      cmp(a, v, lo = false, flipped = true)
    case CLessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      cmp(a, v, lo = false, flipped = false)
    case CLessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      cmp(a, v, lo = false, flipped = true)
    case CIn(a: AttributeReference, vs)
        if vs.forall(_.isInstanceOf[Literal]) =>
      val eqs = vs.flatMap(l => eq(a, l.asInstanceOf[Literal].value))
      if (eqs.length == vs.length && eqs.nonEmpty) Some(Or(eqs))
      else None
    case CInSet(a: AttributeReference, vs) =>
      val eqs = vs.toSeq.flatMap(v => eq(a, v))
      if (eqs.size == vs.size && eqs.nonEmpty) Some(Or(eqs))
      else None
    case CIsNull(a: AttributeReference) => Some(IsNull(a.name))
    case CIsNotNull(a: AttributeReference) => Some(IsNotNull(a.name))
    case CAnd(l, r) =>
      // one convertible conjunct still prunes correctly
      (convert(l), convert(r)) match {
        case (Some(a), Some(b)) => Some(And(Seq(a, b)))
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case COr(l, r) =>
      // disjunction prunes only when BOTH sides convert
      for (a <- convert(l); b <- convert(r)) yield Or(Seq(a, b))
    case _ => None
  }

  private def eq(a: AttributeReference, v: Any): Option[SkipPredicate] =
    numLit(v).map(d => NumRange(a.name, d, d))
      .orElse(strLit(v).map(s => StrEq(a.name, s)))
}

/** `ParquetFileFormat` that applies deletion vectors inside the scan
  * (Delta's `DeltaParquetFileFormat` shape): a dv'd file reads
  * unsplit, unfiltered-by-parquet, row-based — so the row stream is
  * exactly file order — and tombstoned positions drop before Spark
  * sees them. Files WITHOUT dvs (and whole tables without dvs, which
  * never construct this class) keep splitting and parquet pushdown;
  * `supportBatch` turns off table-wide because batch-vs-row is a
  * relation-level decision in Spark's scan exec.
  *
  * Tombstone transport mirrors [[ManifestSink.readFilesDvMeta]]'s
  * broadcast/shuffle split: at most [[GraftParquetFileFormat.BroadcastDvCap]]
  * total tombstones (manifest-known without opening a sidecar) load
  * once on the driver and ship as a broadcast of per-file sorted
  * position arrays; above the cap each dv'd file's TASK reads its own
  * positions from the dv sidecars through parquet-mr with a
  * `name = <file>` record filter — O(own tombstones) per task, no
  * driver funnel, the way Delta tasks read their dv bitmaps.
  */
final class GraftParquetFileFormat(
    private[graft] val dv: GraftParquetFileFormat.DvTransport,
    private[graft] val renameMap: Map[String, String] = Map.empty)
    extends ParquetFileFormat {

  /** The task-side tombstone resolver, memoized so repeated analyses of
    * the same relation (the [[GraftDvScanRule]] rewrite) share one
    * broadcast instead of re-shipping the positions per query.
    */
  @transient private var cachedResolver: String => Array[Long] = _
  private[graft] def taskResolver(spark: SparkSession)
      : String => Array[Long] = synchronized {
    if (cachedResolver == null) cachedResolver = dv.taskSide(spark)
    cachedResolver
  }

  override def supportBatch(sparkSession: SparkSession,
      schema: StructType): Boolean =
    // a mapping-only format (no dv'd files) keeps the vectorized
    // reader — the rename is a pure schema-name translation and rows
    // are positional either way
    if (dv.fileNames.isEmpty) super.supportBatch(sparkSession, schema)
    else false

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    !dv.fileNames.contains(path.getName)

  /** Swap logical for PHYSICAL names (column-mapping read side): the
    * parquet reader resolves columns by name, so the request must use
    * the name the file carries; rows come back positional, so no
    * value-level work happens. Only names in `renameMap` change.
    */
  private def toPhys(st: StructType): StructType =
    if (renameMap.isEmpty) st
    else StructType(st.fields.map { f =>
      renameMap.collectFirst {
        case (l, p) if l.equalsIgnoreCase(f.name) => f.copy(name = p)
      }.getOrElse(f)
    })

  /** Rename filter attribute names logical → physical; a filter shape
    * we cannot rewrite that touches a renamed column is DROPPED —
    * parquet pushdown is advisory (Spark re-applies data filters above
    * the scan), so dropping is correct, just less pruned.
    */
  private def mapFilter(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    if (renameMap.isEmpty) return Some(f)
    def nm(a: String): String = renameMap.collectFirst {
      case (l, p) if l.equalsIgnoreCase(a) => p }.getOrElse(a)
    def untouched(x: Filter): Boolean = x.references.forall(r =>
      !renameMap.keys.exists(_.equalsIgnoreCase(r)))
    f match {
      case EqualTo(a, v)            => Some(EqualTo(nm(a), v))
      case EqualNullSafe(a, v)      => Some(EqualNullSafe(nm(a), v))
      case GreaterThan(a, v)        => Some(GreaterThan(nm(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(nm(a), v))
      case LessThan(a, v)           => Some(LessThan(nm(a), v))
      case LessThanOrEqual(a, v)    => Some(LessThanOrEqual(nm(a), v))
      case In(a, vs)                => Some(In(nm(a), vs))
      case IsNull(a)                => Some(IsNull(nm(a)))
      case IsNotNull(a)             => Some(IsNotNull(nm(a)))
      case StringStartsWith(a, v)   => Some(StringStartsWith(nm(a), v))
      case StringEndsWith(a, v)     => Some(StringEndsWith(nm(a), v))
      case StringContains(a, v)     => Some(StringContains(nm(a), v))
      case And(l, r) => (mapFilter(l), mapFilter(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (Some(a), None)    => Some(a) // conjunct drop keeps a bound
        case (None, Some(b))    => Some(b)
        case _                  => None
      }
      case Or(l, r) => (mapFilter(l), mapFilter(r)) match {
        // weakened (never strengthened) children keep OR sound, but a
        // DROPPED disjunct narrows it — require both to survive
        case (Some(a), Some(b)) => Some(Or(a, b))
        case _                  => None
      }
      case Not(c) =>
        // only keep NOT over a child that needed no translation — a
        // weakened child under NOT would prune rows it must not
        if (untouched(c)) Some(Not(c)) else None
      case other => if (untouched(other)) Some(other) else None
    }
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession, dataSchema0: StructType,
      partitionSchema: StructType, requiredSchema0: StructType,
      filters0: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String], hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val dataSchema = toPhys(dataSchema0)
    val requiredSchema = toPhys(requiredSchema0)
    val filters = filters0.flatMap(mapFilter)
    val withFilters = super.buildReaderWithPartitionValues(sparkSession,
      dataSchema, partitionSchema, requiredSchema, filters, options,
      hadoopConf)
    // dv'd files: NO parquet-side filtering, so row ordinal == file
    // position (the residual filter still applies above the scan)
    val noFilters = super.buildReaderWithPartitionValues(sparkSession,
      dataSchema, partitionSchema, requiredSchema, Nil, options,
      hadoopConf)
    val dvNames = dv.fileNames
    val positionsOf = dv.taskSide(sparkSession)
    (file: PartitionedFile) => {
      val name = file.toPath.getName
      if (!dvNames.contains(name)) withFilters(file)
      else {
        require(file.start == 0,
          s"[graft] dv'd file read as a split: $name — isSplitable " +
            "must have pinned it whole")
        val poss = positionsOf(name) // sorted positions
        val base = noFilters(file)
        new Iterator[InternalRow] {
          private var ordinal = -1L
          private var cursor = 0 // next tombstone to compare
          private var ready: InternalRow = _
          private def advance(): Unit = {
            ready = null
            while (ready == null && base.hasNext) {
              val r = base.next(); ordinal += 1
              while (cursor < poss.length && poss(cursor) < ordinal)
                cursor += 1
              if (cursor < poss.length && poss(cursor) == ordinal)
                cursor += 1 // tombstoned: drop
              else ready = r
            }
          }
          override def hasNext: Boolean = {
            if (ready == null) advance()
            ready != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = ready; ready = null; r
          }
        }
      }
    }
  }
}

object GraftParquetFileFormat {

  /** Total-tombstone bound for the driver-loaded broadcast transport —
    * the same 2M-key heuristic as the Scala read path's broadcast
    * anti-join decision. Var so tests can force the task-read path on
    * small tables.
    */
  @volatile private[graft] var BroadcastDvCap = 2000000L

  /** The empty transport — a mapping-only format with no dv'd files
    * (the [[GraftDvScanRule]] rewrite target for mapped tables).
    */
  private[graft] lazy val NoDv: DvTransport = BroadcastDv(Map.empty)

  /** How tombstone positions reach read tasks. */
  sealed trait DvTransport extends Serializable {
    def fileNames: Set[String]
    /** Build the task-side resolver (driver-called once per scan). */
    def taskSide(spark: SparkSession): String => Array[Long]
  }

  /** Small tables: per-file sorted position arrays in one broadcast. */
  private final case class BroadcastDv(byFile: Map[String, Array[Long]])
      extends DvTransport {
    override val fileNames: Set[String] = byFile.keySet
    override def taskSide(spark: SparkSession)
        : String => Array[Long] = {
      val b = spark.sparkContext.broadcast(byFile)
      name => b.value.getOrElse(name, Array.emptyLongArray)
    }
  }

  /** Large tables: each task reads its own file's positions from the
    * dv sidecars via parquet-mr with a `name = <file>` record filter —
    * sidecars are written sorted by (name, pos), so row-group stats
    * prune the read to the relevant pages.
    */
  private final case class TaskReadDv(
      sidecarsByFile: Map[String, Seq[String]]) extends DvTransport {
    override val fileNames: Set[String] = sidecarsByFile.keySet
    override def taskSide(spark: SparkSession)
        : String => Array[Long] = {
      // tasks rebuild the driver's Hadoop conf from its entries (the
      // FS credentials/endpoints a bare `new Configuration()` would
      // miss on a configured cluster)
      val confEntries: Array[(String, String)] = {
        val it = spark.sparkContext.hadoopConfiguration.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
        while (it.hasNext) {
          val e = it.next(); buf += ((e.getKey, e.getValue))
        }
        buf.toArray
      }
      val b = spark.sparkContext.broadcast((sidecarsByFile, confEntries))
      name => {
        val (byFile, entries) = b.value
        val conf = new Configuration(false)
        entries.foreach { case (k, v) => conf.set(k, v) }
        val sidecars = byFile.getOrElse(name, Seq.empty)
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        sidecars.foreach { sc =>
          import org.apache.parquet.filter2.predicate.FilterApi
          import org.apache.parquet.filter2.compat.FilterCompat
          import org.apache.parquet.io.api.Binary
          val filter = FilterCompat.get(FilterApi.eq(
            FilterApi.binaryColumn("name"), Binary.fromString(name)))
          val reader = org.apache.parquet.hadoop.ParquetReader
            .builder(
              new org.apache.parquet.hadoop.example.GroupReadSupport(),
              new Path(sc))
            .withConf(conf)
            .withFilter(filter)
            .build()
          try {
            var g = reader.read()
            while (g != null) {
              // record-level filtering in parquet-mr is exact, but be
              // defensive about dictionary/stats edge cases
              if (g.getString("name", 0) == name)
                buf += g.getLong("pos", 0)
              g = reader.read()
            }
          } finally reader.close()
        }
        val arr = buf.toArray
        java.util.Arrays.sort(arr)
        arr
      }
    }
  }

  /** Pick the transport from the manifest-known tombstone count. */
  private[graft] def dvPositions(spark: SparkSession,
      handle: ManifestSink.SnapshotHandle): DvTransport = {
    val dest = new Path(handle.destPath)
    val totalDv = handle.dvs.values.flatten.map(_._2).sum
    if (totalDv <= BroadcastDvCap) {
      // one distributed read of the sidecars, grouped per file name —
      // bounded driver memory by the cap (16 bytes/position)
      val sidecars = handle.dvs.values.flatten.map(_._1).toSeq.distinct
        .map(rel => new Path(dest, rel).toString)
      val wanted = handle.dvs.keySet.map { rel =>
        val i = rel.lastIndexOf('/')
        if (i < 0) rel else rel.substring(i + 1)
      }
      val byFile = spark.read
        .schema("name STRING, pos BIGINT") // fixed sidecar schema: skips
        // the per-read footer-inference job
        .parquet(sidecars: _*)
        .select("name", "pos")
        .where(org.apache.spark.sql.functions.col("name")
          .isin(wanted.toSeq: _*)) // sidecars can carry other files'
        // positions (per-commit layout); don't collect those
        .collect()
        .groupBy(_.getString(0))
        .map { case (n, rows) =>
          val arr = rows.map(_.getLong(1))
          java.util.Arrays.sort(arr)
          n -> arr
        }
      BroadcastDv(byFile)
    } else {
      val byFile = handle.dvs.map { case (rel, es) =>
        val i = rel.lastIndexOf('/')
        val name = if (i < 0) rel else rel.substring(i + 1)
        name -> es.map(e => new Path(dest, e._1).toString)
      }
      TaskReadDv(byFile)
    }
  }
}
