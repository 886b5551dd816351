package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Notification-event decode: the reference's PubSub message handling
  * (BucketToBigQuery.js:212-221) as a relational operator chain —
  *  1. keep `eventType == OBJECT_FINALIZE`          (attribute filter)
  *  2. base64-decode the data payload, parse JSON   (F5)
  *  3. keep `kind == storage#object`                (payload filter)
  *  4. first-wins dedup by `selfLink`               (A2, uniqBy)
  * All four are codegen'd built-ins; the JSON schema is explicit so the
  * parse never triggers schema inference.
  */
object Events {

  /** Payload schema of a GCS OBJECT_FINALIZE notification (the fields the
    * reference reads: kind, selfLink, bucket, name).
    */
  val ObjectSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("selfLink", StringType),
    StructField("bucket", StringType),
    StructField("name", StringType)))

  /** Decode base64 JSON payloads into typed columns. */
  def decodePayload(data: Column): Column =
    from_json(unbase64(data).cast("string"), ObjectSchema)

  /** Full chain over a frame of (eventType, data-base64, ordering cols).
    * `orderCols` break ties deterministically for the first-wins dedup
    * (the reference's "first" is pull order; ours is explicit).
    */
  def finalizedObjects(
      events: DataFrame,
      eventTypeCol: String,
      dataCol: String,
      orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val decoded = events
      .filter(col(eventTypeCol) === "OBJECT_FINALIZE")
      .withColumn("obj", decodePayload(col(dataCol)))
      .filter(col("obj.kind") === "storage#object")
      .select(col("obj.selfLink").as("selfLink"),
        col("obj.bucket").as("bucket"), col("obj.name").as("name"),
        struct(orderCols: _*).as("_ord"))
    val w = Window.partitionBy(col("selfLink")).orderBy(col("_ord"))
    decoded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "_ord")
  }
}
