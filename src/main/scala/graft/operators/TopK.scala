package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

  /** Order-preserving bijection IEEE-754 double <-> signed long: positive
    * doubles keep their raw bits (which already order as values); negative
    * doubles get their low 63 bits flipped, correcting the reversed bit
    * order while staying negative. Total order: -NaN < -Inf < ... < -0.0
    * < +0.0 < ... < +Inf < NaN (doubleToLongBits canonicalizes NaN, so
    * every NaN compares equal). Self-inverse modulo the sign test, so
    * scores round-trip bit-exactly through the Long buffer.
    */
  private[graft] def sortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  private[graft] def fromSortableBits(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))

  /** The aggregate: emits `array<struct<score, id: long>>`, best first.
    * The score child may be LongType (compared natively) or DoubleType
    * (stored through [[sortableBits]] — comparisons on the transformed
    * longs order exactly as the doubles, and eval restores the original
    * bits); the id child must be LongType.
    */
  case class TopKAgg(
      left: Expression,
      right: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

    require(k >= 1, "k >= 1")

    private def scoreIsDouble: Boolean = left.dataType == DoubleType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if ((left.dataType == LongType || left.dataType == DoubleType) &&
          right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk expects (LongType|DoubleType score, LongType id), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("score", left.dataType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "topk"

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = left.eval(input)
      val id = right.eval(input)
      if (s != null && id != null) {
        val key =
          if (scoreIsDouble) sortableBits(s.asInstanceOf[Double])
          else s.asInstanceOf[Long]
        b.insert(key, id.asInstanceOf[Long])
      }
      b
    }

    override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
      b.mergeFrom(o); b
    }

    override def eval(b: TopKBuffer): Any =
      new GenericArrayData((0 until b.n).map { i =>
        val s: Any =
          if (scoreIsDouble) fromSortableBits(b.scores(i)) else b.scores(i)
        InternalRow(s, b.ids(i))
      }.toArray[Any])

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
    * (score desc, id asc). Score may be a LongType or DoubleType column;
    * id must be LongType.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())

  /** [[sortableBits]] as a codegen'd scalar expression (DoubleType →
    * LongType, null-preserving) — lets any integer-domain machinery
    * (e.g. [[Quantile]]'s histogram narrowing) run over doubles through
    * the order-preserving bijection and map results back exactly.
    */
  private[graft] case class SortableBitsExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      sortableBits(input.asInstanceOf[Double])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bits = ctx.freshName("bits")
        s"""
          long $bits = java.lang.Double.doubleToLongBits($c);
          ${ev.value} = $bits ^ (($bits >> 63) & 0x7fffffffffffffffL);
        """
      })
    override protected def withNewChildInternal(
        newChild: Expression): SortableBitsExpr = copy(child = newChild)
  }

  /** Column form of [[sortableBits]]; input must be DoubleType. */
  def sortableBitsCol(c: Column): Column =
    Bridge.column(SortableBitsExpr(Bridge.expression(c)))
}
