package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Probe: Spark 4's parquet readers upcast a narrower FILE type to a
  * wider explicit READ schema — the capability `ALTER COLUMN ... TYPE`
  * widening rests on. Every promotion [[graft.ingest.ManifestSink
  * .alterColumnType]] admits is exercised here against real files, so
  * an engine upgrade that drops reader-widening support fails THIS
  * spec, not a user's table.
  */
class WidenProbeSpec extends SparkSpec {
  import spark.implicits._

  test("parquet read with a wider explicit schema upcasts every " +
      "promotion the widening verb admits") {
    val dir = tmpDir("widenprobe_")
    spark.range(1, 3).select(
        col("id").cast("byte").as("b"),
        col("id").cast("short").as("s"),
        col("id").cast("int").as("i"),
        col("id").cast("float").as("f"),
        col("id").cast("decimal(5,2)").as("d"),
        col("id").cast("string").as("v"))
      .write.mode("overwrite").parquet(s"$dir/p")
    def read(fields: (String, DataType)*): Seq[org.apache.spark.sql.Row] =
      spark.read.schema(StructType(fields.map { case (n, t) =>
          StructField(n, t) }.toSeq))
        .parquet(s"$dir/p").orderBy("v").collect().toSeq
    // integral chain: byte -> short/int/long, int -> long
    val r1 = read("b" -> LongType, "s" -> IntegerType, "i" -> LongType,
      "v" -> StringType)
    assert(r1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))) ==
      Seq((1L, 1, 1L), (2L, 2, 2L)))
    // float -> double, integral -> double
    val r2 = read("f" -> DoubleType, "i" -> DoubleType, "v" -> StringType)
    assert(r2.map(r => (r.getDouble(0), r.getDouble(1))) ==
      Seq((1.0, 1.0), (2.0, 2.0)))
    // decimal precision AND scale increase (p - s non-decreasing)
    val r3 = read("d" -> DecimalType(12, 4), "v" -> StringType)
    assert(r3.map(_.getDecimal(0).toPlainString) ==
      Seq("1.0000", "2.0000"))
  }

  test("explicit read schema + basePath keeps partition-directory " +
      "column inference (the readFilesDv withBase contract)") {
    val dir = tmpDir("widenpart_")
    Seq((1, "a", "x"), (2, "b", "y")).toDF("i", "v", "p")
      .write.partitionBy("p").mode("overwrite").parquet(s"$dir/t")
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("p="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
    val sch = StructType(Seq(StructField("i", LongType),
      StructField("v", StringType)))
    val df = spark.read.schema(sch).option("basePath", s"$dir/t")
      .parquet(files: _*)
    assert(df.columns.toSeq == Seq("i", "v", "p"),
      s"partition column lost: ${df.columns.mkString(",")}")
    assert(df.select("i", "p").as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
  }
}
