package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Bridge to Spark's `private[sql]` streaming-DataFrame constructor.
  *
  * A v1 `Source.getBatch` must return a DataFrame whose logical plan
  * reports `isStreaming = true` — `MicroBatchExecution.runBatch`
  * asserts it before splicing the plan into the streaming query. The
  * only constructor that sets the flag is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]`; Spark's own v1 sources (the Kafka
  * connector's `KafkaSource`, which lives under
  * `org.apache.spark.sql.kafka010` for exactly this reason) call it
  * from inside the `org.apache.spark.sql` namespace. This object is
  * graft's equivalent doorway: it re-plans the batch frame as an
  * `RDD[InternalRow]` (lazy — no execution happens here) and rewraps
  * it with the streaming flag set.
  */
object StreamingFrame {

  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
