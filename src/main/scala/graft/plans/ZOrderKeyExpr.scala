package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (Z-order) key: for each of `k` double children, a
  * binary search over that column's sorted rank cuts gives a bucket id
  * in `[0, 2^bits)`; the ids bit-interleave into one long (same-order
  * bits adjacent, earlier columns in higher lanes).
  *
  * Exists because the composed Column form — an unrolled `when`-chain
  * binary search — duplicates its lo/hi subtrees ~3× per level, so the
  * expression TREE grows 3^bits-ish and every level re-materializes the
  * cut-array literal per row: measured 17 s to sort 100k rows at
  * bits=5, where this fused loop is sub-second. One `bits`-step search
  * per column per row, cuts ride along as a referenced driver object
  * (`k × (2^bits - 1)` doubles), whole-stage codegen, no allocation.
  *
  * Nulls and NaNs route to bucket 0 (they sort first, matching the
  * all-null stats convention); output is never null.
  */
case class ZOrderKeyExpr(children: Seq[Expression],
    cuts: Array[Array[Double]], bits: Int) extends Expression {

  require(children.nonEmpty && children.length == cuts.length,
    s"[graft] ZOrderKeyExpr: ${children.length} children vs " +
      s"${cuts.length} cut arrays")
  require(bits >= 1 && bits * children.length <= 60,
    s"[graft] ZOrderKeyExpr: bits ($bits) * k (${children.length}) " +
      "must fit one long")
  require(cuts.forall(_.length == (1 << bits) - 1),
    s"[graft] ZOrderKeyExpr: each column needs ${(1 << bits) - 1} cuts")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val k = children.length
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      var d =
        if (v == null) Double.NegativeInfinity
        else v.asInstanceOf[Double]
      if (d != d) d = Double.NegativeInfinity
      val cs = cuts(j)
      var lo = 0
      var hi = cs.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (d >= cs(m)) lo = m + 1 else hi = m
      }
      var i = 0
      while (i < bits) {
        z |= ((lo.toLong >> i) & 1L) << (i * k + (k - 1 - j))
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val k = children.length
    val cutsRef = ctx.addReferenceObj("zorderCuts", cuts, "double[][]")
    val z = ctx.freshName("z")
    val childGens = children.map(_.genCode(ctx))
    val blocks = childGens.zipWithIndex.map { case (cg, j) =>
      val d = ctx.freshName("d")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      s"""
        double $d = ${cg.isNull} ? Double.NEGATIVE_INFINITY : ${cg.value};
        if (Double.isNaN($d)) $d = Double.NEGATIVE_INFINITY;
        int $lo = 0; int $hi = $cutsRef[$j].length;
        while ($lo < $hi) {
          int $m = ($lo + $hi) >>> 1;
          if ($d >= $cutsRef[$j][$m]) $lo = $m + 1; else $hi = $m;
        }
        for (int $i = 0; $i < $bits; $i++) {
          $z |= (((long) $lo >> $i) & 1L) << ($i * $k + ${k - 1 - j});
        }
      """
    }
    ev.copy(
      code = code"""
        ${childGens.map(_.code).mkString("\n")}
        long $z = 0L;
        ${blocks.mkString("\n")}
        long ${ev.value} = $z;
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyExpr =
    copy(children = newChildren)
}

object ZOrderKeyExpr {
  /** Column-API entry point; children must be double-castable. */
  def key(cols: Seq[Column], cuts: Array[Array[Double]],
      bits: Int): Column =
    Bridge.column(ZOrderKeyExpr(cols.map(Bridge.expression), cuts, bits))
}
