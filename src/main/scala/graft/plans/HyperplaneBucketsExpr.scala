package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Multi-table random-hyperplane (sign) LSH bucket ids for a vector column.
  *
  * Produces `nTables` bucket ids in one fused pass: table `t`'s bucket is
  * the integer formed by the sign bits of the dot products against planes
  * `t*bitsPerTable .. t*bitsPerTable+bitsPerTable-1`. Plane coefficients
  * are the same deterministic LCG as
  * [[graft.functions.VectorOps.deterministicPlanes]] (global plane index
  * `p`, dimension `d`):
  *
  *   coef(p, d) = ((p*dim + d) * 2654435761 mod 2^32) / 2^31 - 1
  *
  * so the identical arithmetic is reproducible inlined in oracle SQL.
  *
  * Why native: the composed higher-order-function form
  * (`zip_with` + `aggregate` folds per plane) is CodegenFallback — per-
  * element lambda dispatch in the hot path of every ANN query. This is one
  * codegen'd loop: `nTables*bitsPerTable` accumulators over a single scan
  * of the vector, no boxing (the trap already fixed for cosine by
  * [[CosineSimilarityExpr]]).
  *
  * Scale posture: multi-table sign-LSH is the standard OR-amplification —
  * the candidate join key is `(table, bucket)`, giving
  * `nTables * 2^bitsPerTable` distinct join keys (shuffle parallelism at
  * 100 TB) while the union over tables recovers the recall a single
  * long-code table destroys.
  */
case class HyperplaneBucketsExpr(
    child: Expression, bitsPerTable: Int, nTables: Int)
    extends UnaryExpression {

  require(bitsPerTable >= 1 && bitsPerTable <= 62, "bitsPerTable in [1,62]")
  require(nTables >= 1, "nTables >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"HyperplaneBucketsExpr expects array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val p = t * bitsPerTable + j
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val x = if (childIsFloat) v.getFloat(d).toDouble else v.getDouble(d)
          val h = (p.toLong * dim + d) * 2654435761L % 4294967296L
          dot += x * (h.toDouble / 2147483648.0 - 1.0)
          d += 1
        }
        if (dot >= 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val bucket = ctx.freshName("bucket")
      val get = if (childIsFloat) s"(double) $v.getFloat($d)"
                else s"$v.getDouble($d)"
      s"""
        int $dim = $v.numElements();
        long[] $out = new long[$nTables];
        for (int $t = 0; $t < $nTables; $t++) {
          long $bucket = 0L;
          for (int $j = 0; $j < $bitsPerTable; $j++) {
            int $p = $t * $bitsPerTable + $j;
            double $dot = 0.0;
            for (int $d = 0; $d < $dim; $d++) {
              long $h = ((long) $p * $dim + $d) * 2654435761L % 4294967296L;
              $dot += ($get) * (((double) $h) / 2147483648.0 - 1.0);
            }
            if ($dot >= 0) $bucket |= 1L << $j;
          }
          $out[$t] = $bucket;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucketsExpr = copy(child = newChild)
}

object HyperplaneBucketsExpr {
  /** Column-API entry point: array of `nTables` bucket ids. */
  def buckets(vec: Column, bitsPerTable: Int, nTables: Int): Column =
    Bridge.column(
      HyperplaneBucketsExpr(Bridge.expression(vec), bitsPerTable, nTables))

  /** Single-table convenience — bit-identical to the composed
    * [[graft.functions.VectorOps.hyperplaneBucket]] over
    * `deterministicPlanes(nPlanes, dim)`.
    */
  def bucket(vec: Column, nPlanes: Int): Column = {
    import org.apache.spark.sql.functions.element_at
    element_at(buckets(vec, nPlanes, 1), 1)
  }
}
