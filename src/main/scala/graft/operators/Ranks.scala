package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group `percent_rank`/`cume_dist` WITHOUT a per-group global
  * sort — the bucket-offset decomposition (the q48 order-quartile shape,
  * generalized).
  *
  * Why: `Window.partitionBy(group).orderBy(value)` funnels each group's
  * FULL row set through one task's sort — a handful of event types over
  * 100 TB of events is a handful of straggler tasks. Here each group is
  * split into ~`nBuckets` value ranges by `percentile_approx` cuts (the
  * sketch only balances WORK — every rank stays exact):
  *
  *   1. per-group cuts: one slim aggregate, broadcast back;
  *   2. per-(group, bucket) counts → per-bucket rank offsets via a
  *      cumulative window over the COUNT TABLE (≤ nBuckets rows per
  *      group — the window partition holds bucket counts, never data
  *      rows), broadcast back;
  *   3. `row_number` within the (group, bucket) window + offset = the
  *      group-global rank; `pr = (rank-1)/(n-1)`, `cd = rank/n` — the
  *      same exact-integer IEEE divisions the built-ins perform, so
  *      results are bit-identical.
  *
  * Requires `(valueCol, tieCol)` unique within a group (then
  * `rank == row_number` and `percent_rank`'s rank ties cannot occur).
  * A group whose values are ALL identical cannot be split by value cuts
  * and degrades to one bucket — such a column is a constant per group,
  * not a ranking domain.
  *
  * Reference context: the reference delegates ranked analytics to its
  * warehouse (buzzware/bucket-to-bigquery readme.md:46); this is the
  * scale-safe form of its `PERCENT_RANK` family.
  */
object Ranks {

  /** Adds `pr` (percent_rank) and `cd` (cume_dist) to `df`, ranked by
    * `(valueCol, tieCol)` ascending within each `groupCol` group. All
    * input columns pass through.
    */
  def percentRanks(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 2, "nBuckets >= 2")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // ascending cuts per group; rows equal to a cut land in the LOWER
    // bucket (value > c strictly), so bucket order agrees with the
    // (value asc, tie) sort and value-equal rows share a bucket.
    // Joins back to the data are NULL-SAFE (<=>): the Window.partitionBy
    // form this replaces ranks a NULL group as its own partition, and a
    // plain equi-join would silently drop those rows instead
    val cuts = df.groupBy(col(groupCol).as("__g"))
      .agg(percentile_approx(col(valueCol).cast("double"),
        typedLit(probs), lit(10000)).as("__cuts"))
    val bucketed = df.join(broadcast(cuts), col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("__bkt",
        size(filter(col("__cuts"), c => col(valueCol).cast("double") > c)))
      .drop("__cuts")

    // offsets from the (group, bucket) COUNT table — ≤ groups·nBuckets
    // rows total, so these windows sort bucket counts, not data
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy(col("__g"))
    val offs = bucketed
      .groupBy(col(groupCol).as("__g"), col("__bkt").as("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wN))
      .drop("__c")

    val w = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col(valueCol), col(tieCol))
    bucketed
      .join(broadcast(offs),
        col(groupCol) <=> col("__g") && col("__bkt") === col("__b"))
      .drop("__g", "__b")
      .withColumn("__rn", row_number().over(w).cast("long") + col("__off"))
      .withColumn("pr",
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("__rn") - 1).cast("double") /
            (col("__n") - 1).cast("double")))
      .withColumn("cd",
        col("__rn").cast("double") / col("__n").cast("double"))
      .drop("__bkt", "__off", "__n", "__rn")
  }
}
