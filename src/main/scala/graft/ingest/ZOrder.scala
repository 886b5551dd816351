package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-interleaved) clustering key for multi-column data
  * skipping.
  *
  * [[ManifestSink.optimize]]'s single-key sort-compaction keeps per-file
  * min/max tight on ONE column: a lexicographic sort by `(x, y)` makes
  * every file span the full `y` domain, so a `y` predicate prunes
  * nothing. Z-ordering maps each row to a point on a space-filling
  * curve — per-column rank-bucket ids, bits interleaved — so files cut
  * from the sorted curve cover small HYPER-RECTANGLES of the combined
  * domain and a selective predicate on ANY of the z columns prunes
  * (Delta/Databricks `ZORDER BY`, the multi-dimensional half of
  * sort-compaction).
  *
  * Scale shape: one `approxQuantile` pass over the data for all
  * columns (distributed sketch, driver holds `2^bits - 1` cut points
  * per column — KBs), then
  * the key itself is a pure row-local expression: an UNROLLED
  * `bits`-step binary search per column over the broadcast-literal cut
  * array plus `bits × k` shift/or terms, all whole-stage-codegen
  * friendly. No window, no join, no extra shuffle beyond the range
  * repartition the caller was already paying for the sort.
  *
  * Rank-bucketing (quantile cuts) rather than raw-value bit slicing
  * makes the curve distribution-invariant: a skewed or offset column
  * still spreads over all `2^bits` buckets, so the interleave balances
  * the dimensions instead of letting the widest-range column dominate.
  */
object ZOrder {

  /** Hidden sort-key column name used by [[ManifestSink.optimize]]. */
  private[graft] val ZCol = "__graft_zorder"

  /** Per-column rank cut points: the `2^bits - 1` interior quantiles of
    * `col` cast to double (nulls excluded by the sketch; [[zkey]] routes
    * them to bucket 0). One distributed pass for ALL columns; the
    * returned state is `k × (2^bits - 1)` doubles — driver sized.
    */
  def cuts(df: DataFrame, cols: Seq[String],
      bits: Int): Seq[(String, Array[Double])] = {
    require(cols.nonEmpty && cols.distinct == cols,
      s"[graft] zorder columns must be non-empty and distinct: $cols")
    require(bits >= 1 && bits * cols.length <= 60,
      s"[graft] zorder needs 1 <= bits ($bits) and " +
        s"bits*k <= 60 (k=${cols.length}) to fit one long")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val numeric = df.select(
      cols.map(c => col(c).cast("double").as(c)): _*)
    // relative error 1/(4n): adjacent cut ranks stay distinguishable, the
    // sketch stays KB-sized; the multi-column overload sketches every
    // column in ONE pass over the data
    cols.zip(numeric.stat.approxQuantile(cols.toArray, probs,
      1.0 / (4 * n)).toSeq).map { case (c, q) => c -> q }
  }

  /** Bucket id in `[0, 2^bits)` for `v` against sorted `cutArr`
    * (`2^bits - 1` entries): an unrolled `bits`-step binary search —
    * `bits` `element_at` probes per row, not a `2^bits`-term scan, and
    * no UDF. Nulls and NaNs sort to bucket 0 via the -Inf coalesce.
    */
  private def bucket(v: Column, cutArr: Array[Double],
      bits: Int): Column = {
    val n = 1 << bits
    require(cutArr.length == n - 1,
      s"[graft] zorder bucket: need ${n - 1} cuts, got ${cutArr.length}")
    val arr = array(cutArr.map(lit): _*)
    val vv = coalesce(nanvl(v.cast("double"), lit(Double.NegativeInfinity)),
      lit(Double.NegativeInfinity))
    var lo: Column = lit(0)
    var hi: Column = lit(n)
    for (_ <- 0 until bits) {
      // m in [1, n-1] throughout: a valid 1-based cut index
      val m = shiftright(lo + hi, 1)
      val ge = vv >= element_at(arr, m)
      lo = when(ge, m).otherwise(lo)
      hi = when(ge, hi).otherwise(m)
    }
    lo
  }

  /** The Morton key: per-column bucket ids bit-interleaved into one
    * long, highest-order bits first and earlier columns in the higher
    * lanes. Pure expression over the literal cuts from [[cuts]] —
    * evaluate-anywhere, codegen'd, broadcast-free.
    */
  def zkey(cutsByCol: Seq[(String, Array[Double])], bits: Int): Column = {
    val k = cutsByCol.length
    require(k >= 1 && bits * k <= 60,
      s"[graft] zorder zkey: bits ($bits) * k ($k) must fit one long")
    val terms = cutsByCol.zipWithIndex.flatMap { case ((c, cutArr), j) =>
      val b = bucket(col(c), cutArr, bits).cast("long")
      (0 until bits).map { i =>
        // bit i of column j lands at position i*k + (k-1-j): same-order
        // bits of all columns stay adjacent, earlier columns higher
        shiftleft(b.bitwiseAND(lit(1L << i)), i * (k - 1) + (k - 1 - j))
      }
    }
    terms.reduce(_.bitwiseOR(_))
  }
}
