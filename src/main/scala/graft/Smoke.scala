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
    spark.stop()
  }
}
