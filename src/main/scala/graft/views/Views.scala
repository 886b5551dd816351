package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived views over loaded time-series tables.
  *
  * The reference's only analytical query is the `_ordered` view
  * (readme.md:43–46): convert (UTC timestamp, utc_offset float hours) →
  * `local_time`, drop the two source columns, order by time. Its SQL goes
  * through a ±HH:MM timezone *string* round-trip; plain interval arithmetic
  * is numerically identical (including fractional :30/:45 offsets) and stays
  * inside whole-stage codegen, so we use that.
  */
object Views {

  /** timestamp + round(utc_offset*60) minutes — the view's core scalar. */
  def localTime(ts: Column, utcOffsetHours: Column): Column =
    ts + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
      round(utcOffsetHours * 60).cast("int"), lit(0))

  /** The `_ordered` view (readme.md:46): local_time first, then every other
    * column except the two inputs (`SELECT DATETIME(...) AS local_time,
    * * EXCEPT (timestamp, utc_offset) ... ORDER BY timestamp`).
    *
    * Global sort = a range-partitioned exchange; at scale, callers that
    * only need per-key order should sortWithinPartitions instead. We keep
    * the reference's global ORDER BY as the view contract.
    */
  def localTimeOrdered(
      df: DataFrame,
      tsCol: String = "timestamp",
      offsetCol: String = "utc_offset"): DataFrame = {
    // ORDER BY references the original UTC timestamp (readme.md:46), which
    // the projection then drops — so sort first, project after (the
    // projection is narrow and preserves the sort).
    val rest = df.columns.filterNot(c => c == tsCol || c == offsetCol)
    df.orderBy(col(tsCol))
      .select(
        (localTime(col(tsCol), col(offsetCol)).as("local_time")
          +: rest.map(col).toSeq): _*)
  }

  /** Register the `_ordered` view in the session catalog under
    * `<table>_ordered` (the reference's view-creation surface,
    * readme.md:43: "CREATE VIEW `<dataset>.<table>_ordered` ...").
    */
  def registerOrderedView(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      df: DataFrame): Unit =
    localTimeOrdered(df).createOrReplaceTempView(s"${table}_ordered")
}
