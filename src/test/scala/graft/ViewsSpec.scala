package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.views.Views

class ViewsSpec extends SparkSpec {

  import spark.implicits._

  test("localTime handles fractional offsets (:30/:45 zones) and negatives") {
    val df = Seq(
      ("2026-08-01 00:00:00", 8.0),    // perth
      ("2026-08-01 00:00:00", 5.75),   // kathmandu
      ("2026-08-01 00:00:00", -5.5),   // odd negative
      ("2026-08-01 00:00:00", 0.0))
      .toDF("ts", "off")
      .select(Views.localTime(col("ts").cast("timestamp"), col("off"))
        .cast("string").as("lt"))
      .as[String].collect()
    assert(df.toSeq == Seq(
      "2026-08-01 08:00:00", "2026-08-01 05:45:00",
      "2026-07-31 18:30:00", "2026-08-01 00:00:00"))
  }

  test("localTimeOrdered drops source cols, orders by UTC time, keeps rest") {
    val df = Seq(
      (Timestamp.valueOf("2026-01-02 00:00:00"), -1.0, "b", 2.0),
      (Timestamp.valueOf("2026-01-01 00:00:00"), 10.0, "a", 1.0))
      .toDF("timestamp", "utc_offset", "loc", "v")
    val out = Views.localTimeOrdered(df)
    assert(out.columns.toSeq == Seq("local_time", "loc", "v"))
    // row with earlier UTC time comes first even though its local time
    // (10:00) is later than the second row's local time (23:00 prev day)
    assert(out.select("loc").as[String].collect().toSeq == Seq("a", "b"))
  }
}
