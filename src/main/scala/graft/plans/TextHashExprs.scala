package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native row-level implementations of the dedup primitives.
  *
  * The composed higher-order-function versions (transform/aggregate
  * lambdas) evaluate one Catalyst lambda call PER ELEMENT per row —
  * interpreted, outside whole-stage codegen. At 5 000 docs that was
  * seconds; at 100 TB it is the difference between CPU-bound and
  * unusable. Each expression here is one JVM call per row with a tight
  * loop inside, semantically IDENTICAL to the composed version (and to
  * the DuckDB oracle SQL): same space-trim/lower/split, same md5-prefix
  * hash, same integer arithmetic.
  */
object TextHashExprs {

  private def hash60(bytes: Array[Byte]): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    // first 15 hex chars = high 60 bits of the digest: 7 full bytes + the
    // high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Distinct in-order word n-gram shingles over a token array; arrays
    * shorter than n collapse to the single whole-text shingle (join by
    * space). Mirrors [[graft.operators.Dedup.shingleSet]].
    */
  case class ShinglesExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val m = toks.numElements()
      val strs = new Array[String](m)
      var i = 0
      while (i < m) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
      val out =
        if (m < n) Array(UTF8String.fromString(strs.mkString(" ")))
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var j = 0
          while (j <= m - n) {
            val sb = new java.lang.StringBuilder(strs(j))
            var k = 1
            while (k < n) { sb.append(' ').append(strs(j + k)); k += 1 }
            seen.add(sb.toString)
            j += 1
          }
          val arr = new Array[UTF8String](seen.size())
          val it = seen.iterator()
          var x = 0
          while (it.hasNext) { arr(x) = UTF8String.fromString(it.next()); x += 1 }
          arr
        }
      new GenericArrayData(out.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): ShinglesExpr =
      copy(child = c)
  }

  /** array<string> -> array<long>: 60-bit md5-prefix hash per element.
    * Mirrors `transform(arr, s -> hash60(s))`.
    */
  case class Md5Prefix60ArrayExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = hash60(arr.getUTF8String(i).getBytes); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(
        c: Expression): Md5Prefix60ArrayExpr = copy(child = c)
  }

  /** array<long> -> array<long>(numHashes): parametrized MinHash signature
    *   sig_i = min over h of ((2i+1)*(h mod 2^31) + 10007*i) mod (2^31-1).
    * Mirrors [[graft.operators.Dedup.minhashSignature]].
    */
  case class MinHashSigExpr(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val m = hs.numElements()
      val out = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < m) {
        val h32 = hs.getLong(i) % 2147483648L
        var s = 0
        while (s < numHashes) {
          val v = ((2L * s + 1) * h32 + 10007L * s) % 2147483647L
          if (v < out(s)) out(s) = v
          s += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
      copy(child = c)
  }

  /** array<long> -> long: SimHash over `bits` low bits of each hash —
    * bit i set iff sum over hashes of (bit_i ? +1 : -1) is positive.
    * Mirrors [[graft.operators.Dedup.simhashFromHashes]].
    */
  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val m = hs.numElements()
      val cnt = new Array[Int](bits)
      var i = 0
      while (i < m) {
        val h = hs.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
        i += 1
      }
      var res = 0L
      var b = 0
      while (b < bits) { if (cnt(b) > 0) res |= 1L << b; b += 1 }
      res
    }
    override protected def withNewChildInternal(c: Expression): SimHashExpr =
      copy(child = c)
  }

  /** array<string> tokens -> language code: argmax of per-language
    * distinct-stopword overlap, first language in `order` wins ties, "und"
    * when no overlap. Mirrors
    * [[graft.functions.TextAnalysis.langIdFromTokens]] (which costs ~30
    * array_intersect evaluations per row when composed).
    */
  case class LangIdExpr(child: Expression, order: Seq[String],
      stopwords: Map[String, Seq[String]])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      order.map { l =>
        val hs = new java.util.HashSet[String]()
        stopwords(l).foreach(hs.add)
        hs
      }.toArray
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val m = toks.numElements()
      val seen = new java.util.HashSet[String]()
      val hits = new Array[Int](order.length)
      var i = 0
      while (i < m) {
        val t = toks.getUTF8String(i).toString
        if (seen.add(t)) {
          var l = 0
          while (l < sets.length) {
            if (sets(l).contains(t)) hits(l) += 1
            l += 1
          }
        }
        i += 1
      }
      var best = 0
      var bestIdx = -1
      var l = 0
      while (l < hits.length) {
        if (hits(l) > best) { best = hits(l); bestIdx = l }
        l += 1
      }
      UTF8String.fromString(if (bestIdx < 0) "und" else order(bestIdx))
    }
    override protected def withNewChildInternal(c: Expression): LangIdExpr =
      copy(child = c)
  }

  /** array<long> -> long: order-sensitive polynomial rolling hash
    * (Rabin–Karp) over pre-modded element hashes:
    *   acc_0 = 0;  acc_{i+1} = (acc_i * 1000003 + (h_i mod P)) mod P,
    * P = 2^31 - 1. A document fingerprint that, unlike the md5 whole-text
    * fingerprint, is incrementally maintainable over windows/streams and
    * reproducible in plain SQL integer arithmetic.
    */
  case class RollingHashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val m = hs.numElements()
      val P = 2147483647L
      var acc = 0L
      var i = 0
      while (i < m) {
        acc = (acc * 1000003L + (hs.getLong(i) % P)) % P
        i += 1
      }
      acc
    }
    override protected def withNewChildInternal(c: Expression): RollingHashExpr =
      copy(child = c)
  }

  /** array<long> -> array<long>: the [[RollingHashExpr]] polynomial hash of
    * EVERY w-element window (n-w+1 hashes; empty when n < w) — the span
    * fingerprints under exact-substring dedup (shared w-token spans across
    * documents). One fused O(n*w) pass per row; the window slide could be
    * O(1) via the modular inverse of 1000003 mod P, but at w<=16 the naive
    * inner loop is already memory-bound and stays oracle-identical to
    * DuckDB's list_reduce over each slice.
    */
  case class WindowedRollingHashExpr(child: Expression, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val P = 2147483647L
      if (n < w) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Long](n - w + 1)
      var i = 0
      while (i <= n - w) {
        var acc = 0L
        var j = i
        while (j < i + w) {
          acc = (acc * 1000003L + (hs.getLong(j) % P)) % P
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(
        c: Expression): WindowedRollingHashExpr = copy(child = c)
  }

  // ------------------------------------------------------- Column helpers

  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(tokens), n))

  def md5Prefix60Array(arr: Column): Column =
    Bridge.column(Md5Prefix60ArrayExpr(Bridge.expression(arr)))

  def minhashSig(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(hashes), numHashes))

  def simhash(hashes: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(hashes), bits))

  def langId(tokens: Column, order: Seq[String],
      stopwords: Map[String, Seq[String]]): Column =
    Bridge.column(LangIdExpr(Bridge.expression(tokens), order, stopwords))

  def rollingHash(hashes: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(hashes)))

  def windowedRollingHash(hashes: Column, w: Int): Column =
    Bridge.column(WindowedRollingHashExpr(Bridge.expression(hashes), w))
}
