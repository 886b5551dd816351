package graft
import org.apache.spark.sql.SparkSession
/** Manual smoke: drive SparkEntry.entry exactly like the driver does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(10, false)
    println(s"SMOKE entry rows=${df.count()}")

    // streaming surface: AvailableNow drain + restart exactly-once
    val root = java.nio.file.Files.createTempDirectory("smoke_stream_").toString
    val src = new java.io.File(s"$root/in"); src.mkdirs()
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.write(body) finally w.close()
    }
    write("a.csv", "timestamp,v\n2026-01-01 00:00:00,1.5\n2026-01-02 00:00:00,2.5\n")
    val task = graft.model.Manifest.parse(
      """{"project":"t","tasks":[{"sources":["**/*.csv"],"dataset":"ds",
           "table":"st","timePartitioningField":"timestamp",
           "fields":[{"name":"timestamp","type":"timestamp"},
                     {"name":"v","type":"float"}]}]}""").tasks.head
    val schema = task.declaredSchema
    graft.streaming.StreamingIngest.start(spark, task, schema,
      s"$root/in", s"$root/wh", s"$root/ckpt").awaitTermination(60000)
    write("b.csv", "timestamp,v\n2026-01-01 12:00:00,3.5\n")
    graft.streaming.StreamingIngest.start(spark, task, schema,
      s"$root/in", s"$root/wh", s"$root/ckpt").awaitTermination(60000)
    val out = spark.read.parquet(s"$root/wh/ds/st")
    println(s"SMOKE streaming rows=${out.count()} " +
      s"day1=${out.filter(org.apache.spark.sql.functions.col("p_date") === "2026-01-01").count()}")
    spark.stop()
  }
}
