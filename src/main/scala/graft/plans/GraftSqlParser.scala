package graft.plans

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.ingest.ManifestSink

/** Maintenance SQL for manifest tables — the verbs Spark's grammar
  * does not have, so the session parser is WRAPPED (Delta's
  * `DeltaSqlParser` shape): statements this surface recognizes parse
  * into graft commands, everything else delegates verbatim.
  *
  * {{{
  * OPTIMIZE t [ZORDER BY (c1, c2)]
  * VACUUM t [RETAIN <n> HOURS] [DRY RUN]
  * DESCRIBE HISTORY t
  * RESTORE TABLE t TO VERSION AS OF 3
  * RESTORE TABLE t TO TIMESTAMP AS OF '2026-08-15 04:00:00'
  * REORG TABLE t APPLY (PURGE)
  * }}}
  *
  * `t` is a catalog table name (`USING graft`) or a single-quoted
  * destination path. Catalog names resolve at execution; a name that
  * is not a graft table refuses loudly (these verbs have no meaning
  * elsewhere). Each command routes to the existing Scala maintenance
  * API — the parser is a ROUTER, exactly like [[GraftDmlRule]].
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(t: String): Expression =
    delegate.parseExpression(t)
  override def parseTableIdentifier(t: String): TableIdentifier =
    delegate.parseTableIdentifier(t)
  override def parseFunctionIdentifier(t: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(t)
  override def parseMultipartIdentifier(t: String): Seq[String] =
    delegate.parseMultipartIdentifier(t)
  override def parseQuery(t: String): LogicalPlan =
    delegate.parseQuery(t)
  override def parseRoutineParam(t: String): StructType =
    delegate.parseRoutineParam(t)
  override def parseDataType(t: String): DataType =
    delegate.parseDataType(t)
  override def parseTableSchema(t: String): StructType =
    delegate.parseTableSchema(t)
}

object GraftSqlParser {

  /** A maintenance target: Left = literal destination path, Right =
    * catalog identifier parts (resolved to a graft table at run).
    */
  type Target = Either[String, Seq[String]]

  // a target is '<path>' or a (possibly backticked, dotted) identifier
  private val Tgt = """(?:'([^']+)'|(`[^`]+`|[\w.]+))"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Tgt +
      """(?:\s+ZORDER\s+BY\s*\(\s*([^)]+?)\s*\))?\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Tgt +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Tgt + """\s*;?\s*$""").r
  private val RestoreVRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Tgt +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val RestoreTRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Tgt +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private val ReorgRe =
    ("""(?is)^\s*REORG\s+TABLE\s+""" + Tgt +
      """\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Tgt + """\s*;?\s*$""").r

  private def target(path: String, ident: String): Target =
    if (path != null) Left(path)
    else Right(ident.split('.').toSeq
      .map(p => if (p.startsWith("`")) p.stripPrefix("`").stripSuffix("`")
        else p))

  private[plans] def parseMaintenance(sql: String): Option[LogicalPlan] =
    sql match {
      case OptimizeRe(p, i, z) =>
        val zcols = Option(z).map(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)).getOrElse(Nil)
        Some(GraftOptimizeSql(target(p, i), zcols))
      case VacuumRe(p, i, hours, dry) =>
        Some(GraftVacuumSql(target(p, i),
          Option(hours).map(_.toLong), dry != null))
      case HistoryRe(p, i) => Some(GraftHistorySql(target(p, i)))
      case RestoreVRe(p, i, v) =>
        Some(GraftRestoreSql(target(p, i), Some(v.toLong), None))
      case RestoreTRe(p, i, ts) =>
        Some(GraftRestoreSql(target(p, i), None, Some(ts)))
      case ReorgRe(p, i) => Some(GraftReorgSql(target(p, i)))
      case DetailRe(p, i) => Some(GraftDetailSql(target(p, i)))
      case _ => None
    }

  /** Catalog identifiers resolve at EXECUTION (the table must be
    * `USING graft`); path targets pass through.
    */
  private[plans] def resolveDest(spark: SparkSession,
      t: Target): String = t match {
    case Left(path) => path
    case Right(ident) =>
      GraftDml.graftCatalogDest(spark, ident).getOrElse(
        throw new AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            (s"[graft] ${ident.mkString(".")} is not a graft table — " +
              "maintenance statements apply to USING graft tables or " +
              "quoted destination paths"))))
  }

  private[plans] def refresh(spark: SparkSession, t: Target): Unit =
    t match {
      case Right(ident) => spark.catalog.refreshTable(ident.mkString("."))
      case Left(_)      => ()
    }
}

/** `OPTIMIZE t [ZORDER BY (...)]` → [[ManifestSink.optimize]]. */
case class GraftOptimizeSql(target: GraftSqlParser.Target,
    zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_repacked", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    val n = ManifestSink.optimize(spark, dest, zorderBy = zorderBy)
    GraftSqlParser.refresh(spark, target)
    Seq(Row(n))
  }
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` → [[ManifestSink.vacuum]] /
  * [[ManifestSink.vacuumDryRun]]. DRY RUN returns the would-delete
  * paths; the real pass returns the deleted count.
  */
case class GraftVacuumSql(target: GraftSqlParser.Target,
    retainHours: Option[Long], dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("path", StringType,
      nullable = false)())
    else Seq(AttributeReference("deleted_files", LongType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    val retentionMs = retainHours
      .map(_ * 3600L * 1000L).getOrElse(7L * 24 * 3600 * 1000)
    if (dryRun)
      ManifestSink.vacuumDryRun(spark, dest, retentionMs).map(Row(_))
    else Seq(Row(ManifestSink.vacuum(spark, dest, retentionMs)))
  }
}

/** `DESCRIBE HISTORY t` → [[ManifestSink.history]]'s commit log. */
case class GraftHistorySql(target: GraftSqlParser.Target)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_ts", TimestampType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    ManifestSink.history(spark, dest).collect().toSeq
  }
}

/** `RESTORE TABLE t TO VERSION|TIMESTAMP AS OF ...` →
  * [[ManifestSink.restore]] / [[ManifestSink.restoreAsOf]]. Returns
  * the new head version.
  */
case class GraftRestoreSql(target: GraftSqlParser.Target,
    version: Option[Long], timestamp: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    val newV = (version, timestamp) match {
      case (Some(v), _) => ManifestSink.restore(spark, dest, v)
      case (_, Some(ts)) =>
        val micros = Cast(Literal(ts), TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
          .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        if (micros == null)
          throw new IllegalArgumentException(
            s"[graft] RESTORE: cannot interpret '$ts' as a timestamp")
        ManifestSink.restoreAsOf(spark, dest,
          micros.asInstanceOf[Long] / 1000L)
      case _ => throw new IllegalStateException("unreachable")
    }
    GraftSqlParser.refresh(spark, target)
    Seq(Row(newV))
  }
}

/** `DESCRIBE DETAIL t` → [[ManifestSink.detail]]: head version, file
  * and byte counts, metadata row count, partition values, stats/bloom
  * columns, dv'd-file count, change-feed flag — the one-row health
  * card (Delta's DESCRIBE DETAIL shape), all from the log.
  */
case class GraftDetailSql(target: GraftSqlParser.Target)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("partition_values", ArrayType(StringType),
      nullable = true)(),
    AttributeReference("stats_columns", ArrayType(StringType),
      nullable = true)(),
    AttributeReference("bloom_columns", ArrayType(StringType),
      nullable = true)(),
    AttributeReference("num_dv_files", LongType, nullable = false)(),
    AttributeReference("change_feed_enabled", BooleanType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    ManifestSink.detail(spark, dest).collect().toSeq
  }
}

/** `SHOW PARTITIONS t` → [[ManifestSink.partitions]]: one row per
  * live partition directory (both levels of a date/hour layout) with
  * file and metadata row counts — log-resolved, zero data reads.
  */
case class GraftShowPartitionsSql(target: GraftSqlParser.Target)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    ManifestSink.partitions(spark, dest).collect().toSeq
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` →
  * [[ManifestSink.renameColumn]]: a METADATA-ONLY commit (column
  * mapping — the log records the logical name and the stable physical
  * file name; no data file is rewritten at any table size; reads and
  * writes translate at the scan/stage boundary). Returns 0 in
  * `files_rewritten`; [[ManifestSink.renameColumnRewrite]] is the
  * explicit physical-rewrite alternative. Syncs the catalog's stored
  * schema afterwards.
  */
case class GraftRenameColumnCommand(dest: String, from: String,
    to: String, ident: TableIdentifier) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val n = ManifestSink.renameColumn(spark, dest, from, to)
    // REQUIRED catalog sync: `FindDataSourceTable` hands the stored
    // schema to the DataSource as user-specified, and a stale name
    // fails INSERT resolution with a schema mismatch.
    // `alterTableDataSchema` refuses renames (it reads them as a
    // drop), so go through `alterTable` with the renamed full schema.
    try {
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      val next = StructType(meta.schema.fields.map(f =>
        if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f))
      spark.sessionState.catalog.alterTable(meta.copy(schema = next))
    } catch {
      // path-form targets have no catalog entry (expected); anything
      // else must be LOUD — the rename itself committed, but INSERTs
      // through this catalog entry will fail analysis until the
      // stored schema is repaired
      case scala.util.control.NonFatal(e) =>
        println(s"METRIC graft.rename_column.catalog_sync_failed=1 " +
          s"table=${ident.quotedString} err=${e.getClass.getSimpleName}")
    }
    GraftDml.refreshAfterDml(spark, Some(ident.quotedString))
    Seq(Row(n))
  }
}

/** `REORG TABLE t APPLY (PURGE)` → [[ManifestSink.purge]] (targeted dv
  * materialization; threshold via `spark.graft.purge.minLiveFraction`,
  * default 0.9).
  */
case class GraftReorgSql(target: GraftSqlParser.Target)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_materialized", LongType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dest = GraftSqlParser.resolveDest(spark, target)
    val frac = spark.conf
      .get("spark.graft.purge.minLiveFraction", "0.9").toDouble
    val n = ManifestSink.purge(spark, dest, minLiveFraction = frac)
    GraftSqlParser.refresh(spark, target)
    Seq(Row(n))
  }
}
