package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed destination tables: the co-located-join half of the 100 TB
  * story. A fact table bucketed (and sorted) by its join key joins other
  * tables bucketed on the same key with NO exchange — the shuffle is paid
  * once at write time and amortized over every subsequent join/aggregate
  * on that key. This is the right layout for the reference's destination
  * tables whenever downstream queries join on a stable key (entity id,
  * order key) rather than only filtering by time.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted EXTERNAL table at `path` (the
    * explicit path keeps data location under caller control; note that
    * overwriting the table with a DIFFERENT path orphans the old files —
    * external-table semantics). Bucket count should be sized so one
    * bucket ~ 100-500 MB at the target scale; it must match across
    * tables meant to co-join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
