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

/** Manifest `authentication` block (reference readme.md:54–56): fields are
  * merged into the storage-client options. Our Spark-first equivalent
  * targets the Hadoop GCS connector configuration surface (`fs.gs.auth.*`,
  * public connector keys).
  *
  * @param keyFilename path to a service-account JSON key; may itself be a
  *                    `gs://` (or any Hadoop-FS) URI — [[Authentication
  *                    .resolve]] fetches and inlines it (index.js:27–35)
  * @param credentials inlined key material (`client_email`, `private_key`,
  *                    ...), either given directly or produced by resolve
  * @param extra       any remaining scalar fields (e.g. `projectId`),
  *                    merged through like the reference's option spread
  */
final case class Authentication(
    keyFilename: Option[String],
    credentials: Option[Map[String, String]],
    extra: Map[String, String]) {
  def isEmpty: Boolean =
    keyFilename.isEmpty && credentials.isEmpty && extra.isEmpty
}

object Authentication {

  /** Resolve a storage-URI `keyFilename` by fetching the key file and
    * inlining it as `credentials`, dropping `keyFilename` — the reference's
    * gs:// indirection (index.js:27–35). Local paths pass through untouched
    * (the connector can read those itself).
    */
  def resolve(
      spark: org.apache.spark.sql.SparkSession,
      auth: Authentication): Authentication =
    auth.keyFilename match {
      case Some(uri) if uri.contains("://") =>
        val p = new org.apache.hadoop.fs.Path(uri)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        val content =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val creds = JsonMethods.parse(content) match {
          case JObject(fields) =>
            fields.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty[String, String]
        }
        auth.copy(keyFilename = None, credentials = Some(creds))
      case _ => auth
    }

  /** Apply to the Hadoop configuration the GCS connector reads. All keys are
    * the connector's public configuration surface; unknown extras are set
    * under their reference names so a site-specific connector can pick them
    * up.
    */
  def applyTo(
      auth: Authentication,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    auth.keyFilename.foreach { kf =>
      conf.set("google.cloud.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
      conf.set("google.cloud.auth.service.account.json.keyfile", kf)
      conf.set("fs.gs.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
      conf.set("fs.gs.auth.service.account.json.keyfile", kf)
    }
    auth.credentials.foreach { c =>
      c.get("client_email").foreach(
        conf.set("fs.gs.auth.service.account.email", _))
      c.get("private_key_id").foreach(
        conf.set("fs.gs.auth.service.account.private.key.id", _))
      c.get("private_key").foreach(
        conf.set("fs.gs.auth.service.account.private.key", _))
      c.get("project_id").foreach(conf.set("fs.gs.project.id", _))
    }
    auth.extra.get("projectId").foreach(conf.set("fs.gs.project.id", _))
  }
}

final case class Manifest(
    project: String,
    bucketNotificationTopic: Option[String],
    jobIdPrefix: Option[String],
    tasks: Seq[Task],
    authentication: Option[Authentication] = None)

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
    // empty {} authentication ≡ absent: use default credentials
    // (reference index.js:36–37 deletes the empty object)
    val auth = (root \ "authentication") match {
      case o: JObject => Some(parseAuth(o)).filterNot(_.isEmpty)
      case _          => None
    }
    Manifest(
      project = str(root \ "project"),
      bucketNotificationTopic =
        (root \ "bucketNotificationTopic").toOption.map(str),
      jobIdPrefix = (root \ "jobIdPrefix").toOption.map(str),
      tasks = tasks,
      authentication = auth)
  }

  private def parseAuth(o: JObject): Authentication = {
    val fields = o.obj.toMap
    val kf = fields.get("keyFilename").collect { case JString(s) => s }
    val creds = fields.get("credentials").collect {
      case JObject(cf) => cf.collect { case (k, JString(v)) => k -> v }.toMap
    }
    val extra = (fields -- Seq("keyFilename", "credentials")).collect {
      case (k, JString(v)) => k -> v
      case (k, JInt(v))    => k -> v.toString
      case (k, JBool(v))   => k -> v.toString
    }
    Authentication(kf, creds, extra)
  }

  /** Resolve + apply the manifest's authentication onto the session's
    * Hadoop conf (no-op when absent) — call once before running tasks,
    * mirroring index.js:27–37.
    */
  def applyAuthentication(
      spark: org.apache.spark.sql.SparkSession, m: Manifest): Unit =
    m.authentication.foreach { a =>
      Authentication.applyTo(
        Authentication.resolve(spark, a),
        spark.sparkContext.hadoopConfiguration)
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
