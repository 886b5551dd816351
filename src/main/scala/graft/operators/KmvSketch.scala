package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — the custom-UDAF surface of the engine
  * (SURVEY §2.10).
  *
  * State = the k smallest DISTINCT 60-bit hashes seen. Estimate
  * = (k-1) * 2^60 / kth_min (the classic KMV estimator); exact count when
  * fewer than k distinct values exist. The state is a set-union semilattice
  * — merge order never changes the result, so the estimate is DETERMINISTIC
  * under any partitioning, and the same arithmetic is reproducible in plain
  * SQL (the oracle computes the kth smallest hash with ORDER BY/LIMIT).
  *
  * Why TypedImperativeAggregate (vs a typed `Aggregator`): the Aggregator
  * path re-encodes the buffer through its product Encoder on EVERY update
  * and allocates a fresh array per insert — per-row ser/de + GC in the hot
  * loop. Here the buffer is ONE mutable primitive long[k] per group,
  * mutated in place with binary-search + arraycopy inserts, serialized
  * only at partial-aggregate exchange boundaries. Partial aggregation
  * (map-side combine) applies as with any aggregate: O(k) state per group
  * flows through the shuffle regardless of input size.
  */
object KmvSketch {

  val DefaultK = 64
  val HashSpace: Double = math.pow(2.0, 60) // hash60 range

  /** Mutable KMV buffer: `arr(0 until n)` holds the n smallest distinct
    * hashes seen, sorted ascending; capacity k.
    */
  final class KmvBuffer(val k: Int) {
    val arr = new Array[Long](k)
    var n = 0

    def insert(h: Long): Unit = {
      if (n == k && h >= arr(k - 1)) return // full and not smaller
      val idx = java.util.Arrays.binarySearch(arr, 0, n, h)
      if (idx >= 0) return // distinct-only state
      val at = -idx - 1
      if (at >= k) return
      val keep = math.min(n, k - 1) // drop the current max when full
      System.arraycopy(arr, at, arr, at + 1, keep - at)
      arr(at) = h
      if (n < k) n += 1
    }

    def mergeFrom(o: KmvBuffer): Unit = {
      var i = 0
      while (i < o.n) { insert(o.arr(i)); i += 1 }
    }

    def estimate: Double =
      if (n < k) n.toDouble
      else (k - 1).toDouble * HashSpace / arr(k - 1).toDouble
  }

  /** The aggregate expression. Input must be a 60-bit hash (LongType),
    * e.g. [[Dedup.hash60]] of the value column.
    */
  case class KmvDistinctAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

    require(k >= 2, "k >= 2")

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_approx_distinct expects a LongType hash input, " +
          s"got ${child.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "kmv_approx_distinct"

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) b.insert(v.asInstanceOf[Long])
      b
    }

    override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
      b.mergeFrom(o); b
    }

    override def eval(b: KmvBuffer): Any = b.estimate

    override def serialize(b: KmvBuffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.n)
      bb.putInt(b.n)
      var i = 0
      while (i < b.n) { bb.putLong(b.arr(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new KmvBuffer(k)
      b.n = bb.getInt()
      var i = 0
      while (i < b.n) { b.arr(i) = bb.getLong(); i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(
        newChild: Expression): KmvDistinctAgg = copy(child = newChild)
  }

  /** Column form: approximate distinct count of the 60-bit-hashed input.
    * Pair with [[graft.operators.Dedup.hash60]] on the value column.
    */
  def approxDistinct(hashedCol: Column, k: Int = DefaultK): Column =
    Bridge.column(
      KmvDistinctAgg(Bridge.expression(hashedCol), k).toAggregateExpression())

  // convenience used by the query surface: round to 6dp for oracle parity
  def approxDistinct6(hashedCol: Column, k: Int): Column =
    round(approxDistinct(hashedCol, k), 6)
}
