package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GetStructField, Not}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileFormat, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** Vectorized scans over deletion-vector'd tables — the Delta
  * `DeltaParquetFileFormat`+row-tracking shape, composed from stock
  * Spark parts instead of a custom reader:
  *
  * [[GraftParquetFileFormat]] applies dvs INSIDE the scan by counting
  * row ordinals, which forces the whole relation row-based, unsplit,
  * and pushdown-less the moment ANY file carries a dv — on a 100 TB
  * CDC-maintained table (which lives in that state permanently) that
  * is the difference between columnar batches and a row-at-a-time
  * tail. This rule — injected by
  * [[graft.plans.GraftExtensions]] — rewrites every such SCAN relation
  * to the stock `ParquetFileFormat` (whole-stage codegen, vectorized
  * batches, splitting, parquet row-group pushdown all back) and
  * re-applies the tombstones as a catalyst `Filter` over the reader's
  * own positional truth:
  *
  *   Project(out, Filter(NOT graft_dv_hit(_metadata.file_name,
  *     _metadata.row_index), relation'))
  *
  * `_metadata.row_index` is the absolute row position the parquet
  * readers maintain through splits AND predicate pushdown (pages
  * skipped by pushdown never disturb surviving rows' indexes — the
  * column exists precisely to anchor row-level operations), so the
  * filter sees exactly the ordinals the dv sidecars recorded. Dv-less
  * files of the same table pay one empty-array probe per row;
  * tombstoned files a binary search — both trivially cheaper than
  * losing columnar reading table-wide.
  *
  * Sessions WITHOUT the graft extensions keep the in-format row-based
  * path — correctness never depends on the rewrite, only speed.
  *
  * DML/INSERT targets are exempt: their relation is only a handle the
  * command layer extracts a destination path from
  * ([[graft.plans.GraftDml.graftTarget]] matches the raw relation),
  * and the write paths own their dv semantics.
  */
final class GraftDvScanRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // escape hatch (and fallback-path test seam): the in-format
    // row-based dv application stays fully correct without the rewrite
    if (session.conf.get("spark.graft.dv.vectorized", "true") != "true")
      return plan
    val exempt: Set[LogicalRelation] = plan.collect {
      case d: DeleteFromTable     => relationsIn(d.table)
      case u: UpdateTable         => relationsIn(u.table)
      case m: MergeIntoTable      => relationsIn(m.targetTable)
      case i: InsertIntoStatement => relationsIn(i.table)
    }.flatten.toSet
    // an explicit `_metadata` reference anywhere in the query keeps
    // the in-format path: the rewrite's Project(lr.output, ...) does
    // not propagate metadata output, so depending on whether
    // AddMetadataColumns ran before or after this rule the reference
    // could fail to resolve — same conservative fallback as the
    // name-conflict case (the in-format dv path is fully correct)
    val wantsMeta = plan.exists(p => p.expressions.exists(_.exists {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        => u.nameParts.exists(_.equalsIgnoreCase(
          FileFormat.METADATA_NAME))
      case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference =>
        a.name.equalsIgnoreCase(FileFormat.METADATA_NAME)
      case _ => false
    }))
    if (wantsMeta) return plan
    plan.resolveOperatorsDown {
      case lr: LogicalRelation if !exempt.contains(lr) =>
        lr.relation match {
          case fs: HadoopFsRelation
              if fs.fileFormat.isInstanceOf[GraftParquetFileFormat] =>
            rewrite(lr, fs,
              fs.fileFormat.asInstanceOf[GraftParquetFileFormat])
          case _ => lr
        }
    }
  }

  private def relationsIn(p: LogicalPlan): Seq[LogicalRelation] =
    p.collect { case lr: LogicalRelation => lr }

  private def rewrite(lr: LogicalRelation, fs: HadoopFsRelation,
      gf: GraftParquetFileFormat): LogicalPlan = {
    // a MAPPED table with no dv'd files keeps its scan as-is: the
    // format is there purely for the name translation, there are no
    // tombstones to filter, and the rewrite's _metadata + dv-hit
    // filter would be pure per-row overhead on every scan forever
    if (gf.dv.fileNames.isEmpty) return lr
    // a mapped table keeps the name-translating format (minus the dv
    // transport — the Filter below applies the dvs); the translation
    // is schema-only, so the vectorized reader stays on
    val stock = fs.copy(fileFormat =
      if (gf.renameMap.isEmpty) new ParquetFileFormat
      else new GraftParquetFileFormat(GraftParquetFileFormat.NoDv,
        gf.renameMap))(session)
    val withMeta = lr.copy(relation = stock).withMetadataColumns()
    // a data column literally named `_metadata` suppresses the
    // metadata output (Spark's conflict rule) — keep the slow-but-
    // correct in-format path for that pathological schema
    val metaAttr = withMeta.output.drop(lr.output.length)
      .find(_.name == FileFormat.METADATA_NAME)
      .getOrElse(return lr)
    val metaType = metaAttr.dataType.asInstanceOf[StructType]
    val nameIdx = metaType.fieldNames.indexOf("file_name")
    val rowIdx = metaType.fieldNames.indexOf("row_index")
    if (nameIdx < 0 || rowIdx < 0) return lr
    val cond = Not(GraftDvHit(
      GetStructField(metaAttr, nameIdx, Some("file_name")),
      GetStructField(metaAttr, rowIdx, Some("row_index")),
      gf.taskResolver(session)))
    Project(lr.output, Filter(cond, withMeta))
  }
}

/** True iff `(file_name, row_index)` names a tombstoned position.
  * `lookup` resolves a file's sorted tombstone array (broadcast map or
  * task-side sidecar read — [[GraftParquetFileFormat.DvTransport]]).
  *
  * Hot-path shape: rows arrive file-by-file, so a one-entry
  * (name → positions) memo makes the per-row cost one `UTF8String`
  * equality + a binary search — no per-row String allocation — and
  * real `doGenCode` keeps the filter inside whole-stage codegen, so a
  * dv'd table's scan stays one fused columnar pipeline. Deterministic,
  * never null (a missing file simply has no tombstones).
  */
case class GraftDvHit(fileName: Expression, rowIndex: Expression,
    lookup: String => Array[Long]) extends BinaryExpression {

  override def left: Expression = fileName
  override def right: Expression = rowIndex
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_hit"

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  // single-threaded per task (the references array deserializes per
  // task); UTF8String values from columnar batches may alias a reused
  // buffer, hence the clone on memo update
  @transient private var lastName: org.apache.spark.unsafe.types.UTF8String = _
  @transient private var lastArr: Array[Long] = _

  def hit(name: org.apache.spark.unsafe.types.UTF8String,
      idx: Long): Boolean = {
    if (lastName == null || !lastName.equals(name)) {
      val key = name.toString
      var arr = cache.get(key)
      if (arr == null) {
        arr = lookup(key)
        cache.put(key, arr)
      }
      lastName = name.clone()
      lastArr = arr
    }
    lastArr.length > 0 &&
      java.util.Arrays.binarySearch(lastArr, idx) >= 0
  }

  override def eval(input: InternalRow): Any = {
    val n = fileName.eval(input)
    val i = rowIndex.eval(input)
    if (n == null || i == null) false
    else hit(n.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      i.asInstanceOf[Long])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("graftDvHit", this,
      classOf[GraftDvHit].getName)
    val nEv = fileName.genCode(ctx)
    val iEv = rowIndex.genCode(ctx)
    ev.copy(code =
      code"""
        ${nEv.code}
        ${iEv.code}
        boolean ${ev.value} = false;
        if (!${nEv.isNull} && !${iEv.isNull}) {
          ${ev.value} = $ref.hit(${nEv.value}, ${iEv.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GraftDvHit =
    copy(fileName = newLeft, rowIndex = newRight)
}
