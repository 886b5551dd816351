package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * Semantically identical to the composed higher-order-function version in
  * [[graft.functions.VectorOps.cosine]] — sequential left-fold double
  * accumulation of dot/norms — but one fused loop per row with full
  * whole-stage codegen, no lambda dispatch and no per-element boxing.
  * Higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback in Spark, so on a 100 TB corpus the composed version
  * pays interpreted-eval costs per element; this expression is the hot-
  * path replacement (SURVEY.md §7 "custom Catalyst candidates").
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Element accessor per side: arrays may be float (raw embeddings) or
    * double (e.g. trained centroids) — mixed inputs supported.
    */
  private def isFloatSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine expects array<float|double>, got $other")
  }
  private lazy val leftIsFloat = isFloatSide(left)
  private lazy val rightIsFloat = isFloatSide(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (leftIsFloat) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $getX;
          double $yi = $getY;
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column-API entry point (inputs must be array<float>). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityExpr(
      Bridge.expression(a), Bridge.expression(b)))
}
