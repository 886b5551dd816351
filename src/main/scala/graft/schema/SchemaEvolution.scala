package graft.schema

import org.apache.spark.sql.types._

/** Schema-evolution planning logic — pure functions, run at planning time on
  * the driver (never per-row).
  *
  * Semantics contract from the reference:
  *  - Columns only ever grow rightward; never removed or reordered
  *    (reference readme.md:25).
  *  - Incoming headers and existing columns must satisfy "same or superset":
  *    one list is a prefix of the other (BucketToBigQuery.js:12–25), else
  *    hard error (:291–292, :304–305).
  *  - Every inferred (right-appended) column is float
  *    (BucketToBigQuery.js:298, :312; readme.md:31).
  *  - If the manifest omits `timePartitioningField`, infer it by testing the
  *    first 5 fields' names against a normalized timestamp-name set
  *    (BucketToBigQuery.js:27–30, :314–319).
  */
object SchemaEvolution {

  /** True iff one name list is a prefix of the other (order-sensitive).
    * Reference `sameOrSuperSet` (BucketToBigQuery.js:12–25).
    */
  def prefixCompatible(a: Seq[String], b: Seq[String]): Boolean =
    if (a.length >= b.length) a.startsWith(b) else b.startsWith(a)

  /** Exception for schema-compatibility violations (the reference throws a
    * plain Error at BucketToBigQuery.js:291–292).
    */
  final class SchemaMismatchException(msg: String)
      extends IllegalArgumentException(msg)

  /** Right-append evolution: given the existing table schema and the sniffed
    * incoming header names, return the (possibly widened) schema. New
    * columns are appended as nullable double ("float",
    * BucketToBigQuery.js:293–300). Throws if the header set is not
    * prefix-compatible with the existing columns.
    */
  def expand(existing: StructType, incomingNames: Seq[String]): StructType = {
    val existingNames = existing.fields.map(_.name).toSeq
    if (!prefixCompatible(existingNames, incomingNames))
      throw new SchemaMismatchException(
        s"incoming headers ${incomingNames.mkString(",")} are not a prefix-" +
          s"superset of existing columns ${existingNames.mkString(",")}")
    if (incomingNames.length <= existingNames.length) existing
    else StructType(
      existing.fields ++ incomingNames.drop(existingNames.length)
        .map(n => StructField(n, DoubleType, nullable = true)))
  }

  /** Schema for a task with declared fields plus sniffed extras
    * (BucketToBigQuery.js:301–313). With no declared fields, everything is
    * sniffed and typed float (the reference types ALL sniffed columns float,
    * :310–313; we keep that contract). A sniffed-only table therefore never
    * has a timestamp-typed column — [[inferPartitionField]] is type-
    * restricted so such tables load unpartitioned instead of failing a
    * `to_date(DOUBLE)` at write time.
    */
  def sniffedSchema(
      declared: StructType, incomingNames: Seq[String]): StructType =
    if (declared.fields.isEmpty)
      StructType(incomingNames.map(n =>
        StructField(n, DoubleType, nullable = true)))
    else expand(declared, incomingNames)

  private val timestampNames =
    Set("timestamp", "createdat", "time", "date", "datetime")

  /** Normalize a column name and test it against the timestamp-name set.
    * The reference lodash-lowerCases then strips separators
    * (BucketToBigQuery.js:27–30; its regex is non-global — a bug we fix by
    * stripping all separators, preserving the *intent* contract).
    */
  def likelyTimestamp(name: String): Boolean =
    timestampNames.contains(name.toLowerCase.replaceAll("[-_ ]", ""))

  /** Infer the partition field: first of the first 5 fields whose name is
    * likely a timestamp (BucketToBigQuery.js:314–319 `_.slice(fields,0,5)`)
    * AND whose declared type can actually partition by day. The type
    * restriction is ours: the reference would happily pick a float column
    * named `timestamp` and fail the load job downstream — here a sniffed
    * (all-float) table simply loads unpartitioned.
    */
  def inferPartitionField(schema: StructType): Option[String] =
    schema.fields.take(5)
      .filter(f => f.dataType == TimestampType || f.dataType == DateType)
      .map(_.name).find(likelyTimestamp)

  /** Decide the effective partition field for a task: explicit wins; absent
    * → inferred; explicit null → none.
    */
  def effectivePartitionField(
      explicitField: Option[String],
      explicitlySet: Boolean,
      schema: StructType): Option[String] =
    if (explicitlySet) explicitField else inferPartitionField(schema)
}
