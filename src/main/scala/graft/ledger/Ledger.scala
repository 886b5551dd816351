package graft.ledger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest ledger: `<table>_imported(imported_at timestamp, uri string)` —
  * one row per loaded file URI, queried before each load and appended after
  * (reference index.js:71–73; BucketToBigQuery.js:384–397).
  *
  * This is the reference's core relational idea: at-least-once notifications
  * become effectively-once *per file* because candidates are anti-joined
  * against the ledger before loading (readme.md:34). We keep the surface but
  * fix the reference's ST5 quirk (ledger written before load completion,
  * BucketToBigQuery.js:361–365): callers append to the ledger only AFTER the
  * destination write action returns.
  *
  * Scale posture: the ledger is a plain parquet table; appends are file-
  * granular and the anti-join re-dedups duplicate ledger rows exactly like
  * the reference's `SELECT DISTINCT uri` (BucketToBigQuery.js:386), so
  * non-transactional parquet appends are safe at file granularity. The
  * anti-join carries NO broadcast hint: the ledger grows without bound, and
  * a LEFT ANTI join can only broadcast its right (ledger) side — forcing
  * that would ship the whole ledger to every task forever. Size stats + AQE
  * broadcast it only while it is genuinely small, then fall back to a
  * shuffled join keyed on uri.
  */
object Ledger {

  val schema: StructType = StructType(Seq(
    StructField("imported_at", TimestampType, nullable = false),
    StructField("uri", StringType, nullable = false)))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read the ledger (empty DataFrame with the right schema if absent). */
  def read(spark: SparkSession, ledgerPath: String): DataFrame =
    if (exists(spark, ledgerPath)) spark.read.schema(schema).parquet(ledgerPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Distinct URIs already imported (reference's ledger query,
    * BucketToBigQuery.js:384–388, sans the IN-list — the join below does
    * the restriction relationally instead of via string-built SQL).
    */
  def importedUris(spark: SparkSession, ledgerPath: String): DataFrame =
    read(spark, ledgerPath).select("uri").distinct()

  /** The anti-join (J1): candidate URIs minus already-imported URIs.
    * `candidates` is a single-column `uri` DataFrame. Deliberately no
    * broadcast hint — see the scale-posture note above.
    */
  def newFiles(candidates: DataFrame, ledger: DataFrame): DataFrame =
    candidates.join(ledger.select("uri").distinct(), Seq("uri"), "left_anti")

  /** Driver-side convenience for planning: which of these file URIs are new. */
  def filterNew(
      spark: SparkSession, ledgerPath: String,
      candidates: Seq[String]): Seq[String] = {
    if (candidates.isEmpty) return Nil
    if (!exists(spark, ledgerPath)) return candidates
    import spark.implicits._
    val cand = candidates.toDF("uri")
    val nf = newFiles(cand, read(spark, ledgerPath))
      .as[String].collect().toSet
    candidates.filter(nf) // preserve caller order
  }

  /** Append one row per loaded URI, stamped now (S5,
    * BucketToBigQuery.js:390–397). Call only after the destination write
    * succeeds.
    */
  def markImported(
      spark: SparkSession, ledgerPath: String, uris: Seq[String]): Unit = {
    if (uris.isEmpty) return
    import spark.implicits._
    uris.toDF("uri")
      .select(current_timestamp().as("imported_at"), col("uri"))
      .write.mode("append").parquet(ledgerPath)
  }
}
