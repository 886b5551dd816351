package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the custom-UDAF surface of the engine (SURVEY §2.10).
  *
  * State = the k smallest DISTINCT 60-bit hashes seen. Estimate
  * = (k-1) * 2^60 / kth_min (the classic KMV estimator); exact count when
  * fewer than k distinct values exist. The state is a set-union semilattice
  * — merge order never changes the result, so the estimate is DETERMINISTIC
  * under any partitioning, and the same arithmetic is reproducible in plain
  * SQL (the oracle computes the kth smallest hash with ORDER BY/LIMIT).
  *
  * Scale: constant O(k) state per group vs collect_set's O(distinct);
  * partial aggregation (map-side combine) applies like any Aggregator.
  */
object KmvSketch {

  val DefaultK = 64
  val HashSpace: Double = math.pow(2.0, 60) // hash60 range

  /** Buffer = sorted ascending array of at most k distinct hashes. */
  final case class Kmv(hashes: Array[Long]) {
    def insert(h: Long, k: Int): Kmv = {
      val idx = java.util.Arrays.binarySearch(hashes, h)
      if (idx >= 0) this // already present
      else {
        val at = -idx - 1
        if (hashes.length >= k && at >= k) this
        else {
          val merged = new Array[Long](math.min(hashes.length + 1, k))
          var i = 0
          while (i < at && i < merged.length) { merged(i) = hashes(i); i += 1 }
          if (at < merged.length) merged(at) = h
          var j = at
          while (j + 1 < merged.length) { merged(j + 1) = hashes(j); j += 1 }
          Kmv(merged)
        }
      }
    }
    def merge(other: Kmv, k: Int): Kmv = {
      // sorted-merge keeping k smallest distinct
      val out = new scala.collection.mutable.ArrayBuffer[Long](k)
      var i = 0
      var j = 0
      while (out.length < k && (i < hashes.length || j < other.hashes.length)) {
        val take =
          if (i >= hashes.length) { val v = other.hashes(j); j += 1; v }
          else if (j >= other.hashes.length) { val v = hashes(i); i += 1; v }
          else if (hashes(i) < other.hashes(j)) { val v = hashes(i); i += 1; v }
          else if (hashes(i) > other.hashes(j)) { val v = other.hashes(j); j += 1; v }
          else { val v = hashes(i); i += 1; j += 1; v }
        if (out.isEmpty || out.last != take) out += take
      }
      Kmv(out.toArray)
    }
    def estimate(k: Int): Double =
      if (hashes.length < k) hashes.length.toDouble
      else (k - 1).toDouble * HashSpace / hashes(k - 1).toDouble
  }

  /** Typed Aggregator over pre-hashed long input. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Kmv, Double] {
    override def zero: Kmv = Kmv(Array.empty)
    override def reduce(b: Kmv, h: Long): Kmv = b.insert(h, k)
    override def merge(a: Kmv, b: Kmv): Kmv = a.merge(b, k)
    override def finish(b: Kmv): Double = b.estimate(k)
    override def bufferEncoder: Encoder[Kmv] = Encoders.product[Kmv]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: approximate distinct count of the 60-bit-hashed input.
    * Pair with [[graft.operators.Dedup.hash60]] on the value column.
    */
  def approxDistinct(hashedCol: Column, k: Int = DefaultK): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hashedCol)

  // convenience used by the query surface: round to 6dp for oracle parity
  def approxDistinct6(hashedCol: Column, k: Int): Column =
    round(approxDistinct(hashedCol, k), 6)
}
