package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Row-local argmax-cosine against a driver-resident centroid set: returns
  * the id of the max-cosine centroid (ties -> smaller id — identical to a
  * `row_number() OVER (ORDER BY cosine DESC, cid)` argmax, so the oracle
  * SQL reproduces it).
  *
  * Why: assigning every corpus vector to its cell via
  * `crossJoin(broadcast(cents)) + row_number window` explodes the corpus
  * k-fold THROUGH A SHUFFLE just to pick one row back. With the centroids
  * known at planning time (they are k x dim doubles on the driver), the
  * assignment is a pure NARROW projection — the inverted-list build for
  * IVF becomes one codegen'd map pass with zero exchanges, which is the
  * plan that survives a 100 TB corpus.
  *
  * Arithmetic matches [[CosineSimilarityExpr]]: per-centroid
  * `dot/(sqrt(|v|^2)*sqrt(|c|^2))` with sequential index-order folds;
  * centroid norms are precomputed with the same fold, so the doubles are
  * bit-identical to computing them per row.
  */
case class ArgmaxCosineExpr(
    child: Expression,
    cids: Array[Int],
    centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(cids.length == centroids.length && cids.nonEmpty,
    "one id per centroid, at least one centroid")

  override def dataType: DataType = IntegerType

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"argmax_cosine expects array<float|double>, got $other")
  }

  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var ny = 0.0
      var i = 0
      while (i < c.length) { ny += c(i) * c(i); i += 1 }
      math.sqrt(ny)
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bestCid = cids(0)
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val ce = centroids(c)
      val n = math.min(v.numElements(), ce.length)
      var dot = 0.0
      var nx = 0.0
      var i = 0
      while (i < n) {
        val xi = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += xi * ce(i)
        nx += xi * xi
        i += 1
      }
      var s = dot / (math.sqrt(nx) * centroidNorms(c))
      // NaN (zero-norm vector or centroid) must sort FIRST, matching both
      // Spark's and DuckDB's ORDER BY DESC total order where NaN is the
      // largest value — plain Java > would silently skip it instead
      if (s.isNaN) s = Double.PositiveInfinity
      // strict > keeps the first (smallest-cid) winner on ties — the
      // row_number (cosine DESC, cid ASC) contract; cids are sorted asc
      if (s > bestS) { bestS = s; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids,
      "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    val normsRef = ctx.addReferenceObj("norms", centroidNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ce = ctx.freshName("ce")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val s = ctx.freshName("s")
      val bestS = ctx.freshName("bestS")
      val bestCid = ctx.freshName("bestCid")
      val xi = ctx.freshName("xi")
      val get = if (childIsFloat) s"(double) $v.getFloat($i)"
                else s"$v.getDouble($i)"
      s"""
        int $bestCid = $cidsRef[0];
        double $bestS = Double.NEGATIVE_INFINITY;
        for (int $c = 0; $c < $centsRef.length; $c++) {
          double[] $ce = $centsRef[$c];
          int $n = java.lang.Math.min($v.numElements(), $ce.length);
          double $dot = 0.0; double $nx = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = $get;
            $dot += $xi * $ce[$i]; $nx += $xi * $xi;
          }
          double $s = $dot / (java.lang.Math.sqrt($nx) * $normsRef[$c]);
          if (Double.isNaN($s)) $s = Double.POSITIVE_INFINITY;
          if ($s > $bestS) { $bestS = $s; $bestCid = $cidsRef[$c]; }
        }
        ${ev.value} = $bestCid;
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgmaxCosineExpr = copy(child = newChild)
}

object ArgmaxCosineExpr {
  /** Column API: nearest-centroid id (ids/centroids sorted by id asc). */
  def assign(vec: Column, cids: Array[Int],
      centroids: Array[Array[Double]]): Column =
    Bridge.column(ArgmaxCosineExpr(Bridge.expression(vec), cids, centroids))
}
