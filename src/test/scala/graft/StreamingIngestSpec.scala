package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Manifest
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("utc_offset", DoubleType),
    StructField("location", StringType),
    StructField("temp_c", DoubleType)))

  private val manifestJson =
    """{"project":"t","tasks":[{
        "sources":["**/*.csv"], "dataset":"ds", "table":"st",
        "timePartitioningField":"timestamp",
        "fields":[{"name":"timestamp","type":"timestamp"}]}]}"""

  test("AvailableNow drain loads files exactly once across restarts") {
    val root = tmpDir("stream_")
    val src = new java.io.File(s"$root/in"); src.mkdirs()
    def write(name: String, rows: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.write("timestamp,utc_offset,location,temp_c\n" + rows)
      finally w.close()
    }
    write("a.csv", "2026-01-01 00:00:00,1.0,x,10.5\n2026-01-02 00:00:00,1.0,y,11.5\n")

    val task = Manifest.parse(manifestJson).tasks.head
    val q1 = StreamingIngest.start(spark, task, schema,
      s"$root/in", s"$root/wh", s"$root/ckpt")
    q1.awaitTermination(60000)

    val dest = s"$root/wh/ds/st"
    assert(spark.read.parquet(dest).count() == 2)
    // event-time DAY partitions on disk (ST3: late data lands correctly)
    val parts = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_ == "_spark_metadata").sorted.toSeq
    assert(parts == Seq("p_date=2026-01-01", "p_date=2026-01-02"))

    // restart with one new file: checkpoint (the streaming ledger) must
    // load ONLY the new file — exactly-once per file (ST2)
    write("b.csv", "2026-01-01 12:00:00,2.0,z,12.5\n")
    val q2 = StreamingIngest.start(spark, task, schema,
      s"$root/in", s"$root/wh", s"$root/ckpt")
    q2.awaitTermination(60000)
    val out = spark.read.parquet(dest)
    assert(out.count() == 3)
    // late row joined the existing day partition
    assert(out.filter(col("p_date") === "2026-01-01").count() == 2)
  }

  test("firstSeen: stateful cross-batch dedup emits each key once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[(String, Int)]
    val out = StreamingIngest.firstSeen(
      in.toDS().groupByKey(_._1))
    val q = out.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(("a", 1), ("a", 2), ("b", 3))
      q.processAllAvailable()
      // second batch replays a and adds c — only c comes through
      in.addData(("a", 9), ("c", 4), ("c", 5))
      q.processAllAvailable()
      val rows = spark.table("first_seen").as[(String, Int)]
        .collect().sortBy(_._1)
      assert(rows.toSeq == Seq(("a", 1), ("b", 3), ("c", 4)))
    } finally q.stop()
  }

  test("windowed channel stats: tumbling window with watermark (batch-run)") {
    import spark.implicits._
    val df = Seq(
      ("2026-01-01 00:10:00", "a", 1.0),
      ("2026-01-01 00:20:00", "a", 3.0),
      ("2026-01-01 01:10:00", "a", 5.0),
      ("2026-01-01 00:30:00", "b", 7.0))
      .toDF("ts", "k", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = StreamingIngest.windowedChannelStats(df, "ts", "k", "v")
      .select(col("window.start").cast("string").as("ws"), col("k"),
        col("n"), col("sum_value"))
      .orderBy("ws", "k")
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      ("2026-01-01 00:00:00", "a", 2L, 4.0),
      ("2026-01-01 00:00:00", "b", 1L, 7.0),
      ("2026-01-01 01:00:00", "a", 1L, 5.0)))
  }
}
