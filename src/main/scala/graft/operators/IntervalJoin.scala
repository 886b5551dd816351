package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed INTERVAL-OVERLAP join: all pairs `(l, r)` with
  * `[lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅` (inclusive integer bounds),
  * WITHOUT the cross product a naive `l.s <= r.e AND r.s <= l.e`
  * theta-join plans as (Spark lowers a pure inequality join to
  * BroadcastNestedLoopJoin — quadratic the day the small side stops
  * being small).
  *
  * Scale shape (the standard interval-binning decomposition, cf. Flink's
  * interval join and the DBToaster/IEJoin literature): each interval
  * explodes to the fixed-width buckets it covers, the join is an
  * EQUI-join on bucket id — hash-shuffled, AQE-balanced, never
  * all-pairs — and the overlap predicate runs as a post-filter inside
  * the joined bucket. A pair overlapping across k shared buckets is
  * emitted exactly ONCE, filtered to the bucket that contains
  * `max(lStart, rStart)` (the overlap region's left edge, covered by
  * both sides by construction) — dedup is a row-local predicate, not a
  * `distinct` shuffle.
  *
  * `bucketWidth` (a power of two — bucket ids come from an arithmetic
  * shift, exact over the FULL long domain where a double division would
  * round above 2^53) trades explode factor against bucket co-residency:
  * pick it near the median interval length. Per-row fan-out is
  * `span/width + 1`; `maxBucketsPerInterval` fails loudly — at plan
  * build, not task OOM — when one pathological interval would explode
  * past it.
  *
  * Rows with `start > end` are empty intervals and drop out; bounds must
  * be integral (long-castable). Left and right column sets must be
  * disjoint — alias before joining.
  */
object IntervalJoin {

  private val BucketCol = "__graft_ivbucket"

  /** Floor-division bucket id, exact for every long: `pmod` brings the
    * value to the bucket's left edge (negatives included), the
    * arithmetic shift divides exactly.
    */
  private def bucketOf(c: Column, log2w: Int): Column = {
    val w = 1L << log2w
    shiftright(c.cast("long") - pmod(c.cast("long"), lit(w)), log2w)
  }

  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0 && (bucketWidth & (bucketWidth - 1)) == 0,
      s"[graft] overlapJoin bucketWidth must be a power of two, " +
        s"got $bucketWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"[graft] overlapJoin column collision on ${shared.mkString(",")} " +
        "— alias one side before joining")
    val log2w = java.lang.Long.numberOfTrailingZeros(bucketWidth)

    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = bucketOf(col(s), log2w)
      val b1 = bucketOf(col(e), log2w)
      df.where(col(s) <= col(e))
        .withColumn(BucketCol, explode(sequence(b0,
          when(b1 - b0 < maxBucketsPerInterval, b1).otherwise(
            raise_error(concat(lit(s"[graft] overlapJoin: interval in " +
              s"[$s,$e] spans more than $maxBucketsPerInterval buckets " +
              s"of width $bucketWidth — widen bucketWidth or split the " +
              "interval: start="), col(s).cast("string"),
              lit(" end="), col(e).cast("string")))))))
    }

    val lb = explodeBuckets(left, lStart, lEnd)
    val rb = explodeBuckets(right, rStart, rEnd)
    lb.join(rb, Seq(BucketCol))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col(BucketCol) ===
        bucketOf(greatest(col(lStart), col(rStart)), log2w))
      .drop(BucketCol)
  }
}
