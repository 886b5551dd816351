package graft.model

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Manifest data model — the configuration surface of the reference loader.
  *
  * Mirrors the JSON manifest consumed by the reference
  * (reference readme.md:51–86; BucketToBigQuery.js:35–46): a project-level
  * config with a list of tasks, each task mapping a set of source glob
  * patterns to one destination table with declared fields and an optional
  * time-partitioning field.
  *
  * Types are the reference's BigQuery type strings (`timestamp`, `float`,
  * `string`, plus the obvious friends) mapped onto Spark's type system.
  */
final case class FieldSpec(name: String, `type`: String) {
  def toStructField: StructField =
    StructField(name, FieldSpec.sparkType(`type`), nullable = true)
}

object FieldSpec {
  /** Reference type string → Spark DataType. The reference passes BigQuery
    * type strings through verbatim (readme.md:69–82); every *inferred*
    * column is float (BucketToBigQuery.js:298,312).
    */
  def sparkType(t: String): DataType = t.toLowerCase match {
    case "timestamp"            => TimestampType
    case "datetime"             => TimestampType
    case "date"                 => DateType
    case "float" | "float64"    => DoubleType
    case "integer" | "int64"    => LongType
    case "boolean" | "bool"     => BooleanType
    case "string" | _           => StringType
  }
}

/** One load task: glob sources → one destination table.
  * Reference: readme.md:57–84.
  *
  * @param sources               glob patterns over object storage with full
  *                              `**` hierarchy matching
  *                              (BucketToBigQuery.js:237)
  * @param dataset               destination dataset (→ a directory for us)
  * @param table                 destination table name
  * @param timePartitioningField Some(col) = partition on col;
  *                              Some(null)/None semantics match the
  *                              reference: absent key → infer via
  *                              likelyTimestamp over the first 5 fields
  *                              (BucketToBigQuery.js:314–319); explicit null
  *                              → unpartitioned (:318–319)
  * @param fields                declared leading columns; sniffed extras are
  *                              right-appended as float
  */
final case class Task(
    sources: Seq[String],
    dataset: String,
    table: String,
    timePartitioningField: Option[String],
    timePartitioningFieldSet: Boolean,
    fields: Seq[FieldSpec]) {

  def declaredSchema: StructType = StructType(fields.map(_.toStructField))
  def qualifiedName: String = s"$dataset.$table"
  def ledgerTable: String = s"${table}_imported"
}

final case class Manifest(
    project: String,
    bucketNotificationTopic: Option[String],
    jobIdPrefix: Option[String],
    tasks: Seq[Task])

object Manifest {

  /** Parse a manifest JSON document (reference readme.md:51–86). */
  def parse(json: String): Manifest = {
    val root = JsonMethods.parse(json)
    def str(v: JValue): String = v match {
      case JString(s) => s
      case other      => other.toString
    }
    val tasks = (root \ "tasks") match {
      case JArray(ts) => ts.map(parseTask)
      case _          => Nil
    }
    Manifest(
      project = str(root \ "project"),
      bucketNotificationTopic =
        (root \ "bucketNotificationTopic").toOption.map(str),
      jobIdPrefix = (root \ "jobIdPrefix").toOption.map(str),
      tasks = tasks)
  }

  private def parseTask(t: JValue): Task = {
    val sources = (t \ "sources") match {
      case JArray(ss) => ss.collect { case JString(s) => s }
      case JString(s) => Seq(s)
      case _          => Nil
    }
    val fields = (t \ "fields") match {
      case JArray(fs) =>
        fs.map { f =>
          FieldSpec(
            (f \ "name").values.toString,
            (f \ "type").values.toString)
        }
      case _ => Nil
    }
    val tpfRaw = t \ "timePartitioningField"
    val (tpf, tpfSet) = tpfRaw match {
      case JNothing   => (None, false)    // absent → infer
      case JNull      => (None, true)     // explicit null → unpartitioned
      case JString(s) => (Some(s), true)
      case other      => (Some(other.values.toString), true)
    }
    Task(
      sources = sources,
      dataset = (t \ "dataset").values.toString,
      table = (t \ "table").values.toString,
      timePartitioningField = tpf,
      timePartitioningFieldSet = tpfSet,
      fields = fields)
  }
}
