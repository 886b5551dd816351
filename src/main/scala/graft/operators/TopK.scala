package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact top-k per group as a native `TypedImperativeAggregate` — the
  * scale-correct alternative to the window-rank idiom.
  *
  * `row_number().over(partitionBy(g).orderBy(s))` shuffles EVERY row of
  * every group and sorts each group in one task — at web scale a hot
  * group (one language, one domain) is a straggler sort of billions of
  * rows that keeps k of them. This aggregate keeps a bounded buffer of
  * the k best `(score, id)` pairs per group, merged map-side like any
  * partial aggregate: the shuffle carries at most k pairs per group per
  * input partition, never the group's rows, and no per-group global sort
  * exists at any size.
  *
  * Total order: higher score wins, ties broken by SMALLER id — a
  * deterministic total order over distinct ids, so the result (and its
  * emitted rank) is independent of partitioning and merge order, and
  * reproducible by a plain `row_number ... ORDER BY score DESC, id` in
  * SQL. Duplicate (score, id) inputs are kept, mirroring row_number
  * semantics.
  */
object TopK {

  /** Mutable buffer: parallel arrays sorted best-first, capacity k. */
  final class TopKBuffer(val k: Int) {
    val scores = new Array[Long](k)
    val ids = new Array[Long](k)
    var n = 0

    // does (s, id) beat slot i?
    private def beats(s: Long, id: Long, i: Int): Boolean =
      s > scores(i) || (s == scores(i) && id < ids(i))

    def insert(s: Long, id: Long): Unit = {
      if (n == k && !beats(s, id, k - 1)) return
      var at = n
      var i = 0
      while (i < n) {
        if (beats(s, id, i)) { at = i; i = n } else i += 1
      }
      if (at >= k) return
      val keep = math.min(n, k - 1)
      System.arraycopy(scores, at, scores, at + 1, keep - at)
      System.arraycopy(ids, at, ids, at + 1, keep - at)
      scores(at) = s
      ids(at) = id
      if (n < k) n += 1
    }

    def mergeFrom(o: TopKBuffer): Unit = {
      var i = 0
      while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
    }
  }

  /** The aggregate: emits `array<struct<score: long, id: long>>`, best
    * first. Children must both be LongType.
    */
  case class TopKAgg(
      left: Expression,
      right: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

    require(k >= 1, "k >= 1")

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk expects (LongType score, LongType id), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "topk"

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = left.eval(input)
      val id = right.eval(input)
      if (s != null && id != null)
        b.insert(s.asInstanceOf[Long], id.asInstanceOf[Long])
      b
    }

    override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
      b.mergeFrom(o); b
    }

    override def eval(b: TopKBuffer): Any =
      new GenericArrayData((0 until b.n).map(i =>
        InternalRow(b.scores(i), b.ids(i))).toArray[Any])

    override def serialize(b: TopKBuffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
      bb.putInt(b.n)
      var i = 0
      while (i < b.n) { bb.putLong(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new TopKBuffer(k)
      val n = bb.getInt()
      var i = 0
      // serialize() wrote the slots best-first and n <= k, so the arrays
      // can be filled positionally — a true O(n) rebuild (insert() would
      // rescan from slot 0 per element, i.e. O(k^2))
      while (i < n) {
        b.scores(i) = bb.getLong()
        b.ids(i) = bb.getLong()
        i += 1
      }
      b.n = n
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKAgg =
      copy(left = newLeft, right = newRight)
  }

  /** Column form: the k best (score, id) pairs of the group, best first
    * (score desc, id asc). Both inputs must be LongType columns.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
