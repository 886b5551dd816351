package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector operations over embedding columns (`array<float>`).
  *
  * Arithmetic is done in double with a fixed left-fold order
  * (`functions.aggregate` is a sequential fold), so results are
  * deterministic and engine-reproducible. These composed higher-order
  * functions are the correctness baseline; the codegen'd
  * [[graft.plans.CosineSimilarityExpr]] is the hot-path implementation —
  * same semantics, one fused loop per row.
  */
object VectorOps {

  /** Sequential left-fold sum of an array<double> expression. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane (SimHash-style) LSH bucket id: `planes` is a
    * driver-side matrix of unit-free hyperplane coefficients; the bucket is
    * the integer formed by the sign bits of the dot products. Deterministic
    * given the planes, so the same planes inlined into SQL reproduce it.
    */
  def hyperplaneBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = fsum(zip_with(vec, typedLit(p.toSeq),
        (x, c) => x.cast("double") * c))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (LCG over plane/dim index) —
    * reproducible anywhere, including inlined in oracle SQL.
    */
  def deterministicPlanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = (p.toLong * dim + d) * 2654435761L % 4294967296L
      h.toDouble / 2147483648.0 - 1.0
    }
}
