package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver's testdata has changed the `events.ts` physical type twice
  * (TIMESTAMP(NANOS) → timestamp[us]/NTZ). [[SparkEntry.events]] must keep
  * loading every generation to the SAME session-TZ TIMESTAMP frame, so the
  * third drift is free. One fixture, three physical encodings:
  *
  *  - epoch-long nanos — what Spark surfaces for parquet TIMESTAMP(NANOS)
  *    under `spark.sql.legacy.parquet.nanosAsLong` (the r1–r12 testdata);
  *  - TIMESTAMP_NTZ micros — parquet timestamp[us] with isAdjustedToUTC
  *    false (the r13+ testdata, as pyarrow writes naive timestamps);
  *  - instant TIMESTAMP micros — parquet timestamp[us] adjusted to UTC
  *    (what a Spark writer itself would produce).
  */
class EventsReaderSpec extends SparkSpec {

  test("events() loads identical frames across ts physical-type drift") {
    import spark.implicits._

    // micros chosen with a sub-millisecond tail to prove the nanos path
    // truncates (not rounds) exactly like DuckDB's ns→us cast
    val rows = Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, """{"k":1}"""),
      (2L, 1700000123456789L, 11L, "view", 2.5, """{"k":2}"""),
      (3L, 1700086400000001L, 10L, "purchase", 3.5, """{"k":3}""")
    )
    val base = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

    def write(prefix: String, df: DataFrame): String = {
      val dir = tmpDir(prefix)
      df.select(cols.map(col): _*).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    val ntzDir = write("ev_ntz_",
      base.withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType)).drop("us"))
    val instantDir = write("ev_instant_",
      base.withColumn("ts", timestamp_micros($"us")).drop("us"))
    // 789 micros -> 789_500 nanos: survives div-1000 truncation unchanged
    val nanosDir = write("ev_nanos_",
      base.withColumn("ts", ($"us" * 1000L + lit(500L)).cast(LongType)).drop("us"))

    // each physical encoding actually landed in the parquet footer
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$instantDir/events.parquet").schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$nanosDir/events.parquet").schema("ts").dataType == LongType)

    def load(dir: String): (StructType, Seq[String]) = {
      val df = SparkEntry.events(spark, dir).select(cols.map(col): _*)
      (df.schema,
       df.orderBy("event_id").collect().map(_.mkString("|")).toSeq)
    }

    val (ntzSchema, ntz) = load(ntzDir)
    val (instSchema, inst) = load(instantDir)
    val (nanoSchema, nano) = load(nanosDir)

    assert(ntzSchema("ts").dataType == TimestampType)
    assert(instSchema == ntzSchema)
    assert(nanoSchema == ntzSchema)
    assert(ntz == inst, "NTZ vs instant frames differ")
    assert(ntz == nano, "NTZ vs nanos-long frames differ")
    assert(ntz.size == 3)
    assert(ntz(1).contains("2023-11-14 22:15:23.456789"))
  }
}
