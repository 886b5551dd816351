package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native PQ encoder: per subvector, the index of the L2-nearest codebook
  * entry over an `array<double>` residual (first index wins ties — the
  * `ORDER BY d, k` rule the DuckDB oracle replays).
  *
  * Semantically identical to the composed fold in
  * [[graft.operators.Similarity.pqEncode]] (parity-asserted by
  * SimilaritySpec), but ONE fused loop nest per row with whole-stage
  * codegen. The composed version pays interpreted lambda dispatch per
  * (subvector x entry x dimension) step — measured ~0.45 ms/vector at 64
  * dims / 8x16 codebooks, which is the difference between a 9 s and a
  * sub-second q62 at sf0.1 and the difference between feasible and not at
  * corpus scale. The codebook rides along as a referenced driver object
  * (nSub x K x ds doubles — a few KB).
  */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private lazy val nSub = cb.length
  private lazy val kk = cb(0).length
  private lazy val ds = cb(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[ArrayData]
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var bestD = Double.MaxValue
      var bestK = -1
      var k = 0
      while (k < kk) {
        val entry = cb(m)(k)
        var d = 0.0
        var i = 0
        while (i < ds) {
          val diff = r.getDouble(m * ds + i) - entry(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      out(m) = bestK
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, r => {
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestK = ctx.freshName("bestK")
      val entry = ctx.freshName("entry")
      s"""
        int[] $out = new int[$nSub];
        for (int $m = 0; $m < $nSub; $m++) {
          double $bestD = Double.MAX_VALUE;
          int $bestK = -1;
          for (int $k = 0; $k < $kk; $k++) {
            double[] $entry = $cbRef[$m][$k];
            double $d = 0.0;
            for (int $i = 0; $i < $ds; $i++) {
              double $diff = $r.getDouble($m * $ds + $i) - $entry[$i];
              $d += $diff * $diff;
            }
            if ($d < $bestD) { $bestD = $d; $bestK = $k; }
          }
          $out[$m] = $bestK;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpr = copy(child = newChild)
}

object PqEncodeExpr {
  /** Column-API entry point; `residual` must be array<double>. */
  def encode(residual: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(residual), cb))
}
