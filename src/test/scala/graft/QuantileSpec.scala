package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Quantile

class QuantileSpec extends SparkSpec {

  import spark.implicits._

  /** DuckDB quantile_disc semantics: sorted multiset's 1-based element
    * max(1, ceil(q·n)).
    */
  private def reference(values: Seq[Long], q: Double): Long = {
    val sorted = values.sorted
    sorted(math.max(1L, math.ceil(q * values.size).toLong).toInt - 1)
  }

  test("quantilesDisc matches the sorted-sequence rank on a known set, " +
      "duplicates and negatives included") {
    val values: Seq[Long] = Seq(5L, -3L, 5L, 5L, 0L, 12L, -3L, 7L, 100L, 1L)
    val df = values.toDF("n")
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Quantile.quantilesDisc(df, "n", qs)
    assert(got == qs.map(q => (q, reference(values, q))))
  }

  test("wide value range forces multiple histogram passes and stays exact") {
    // values spread over ~2^40: one 2^14-bucket pass cannot finish
    val values: Seq[Long] =
      (0 until 500).map(i => (i.toLong * 2199023255L) - 300000000000L)
    val df = values.toDF("n")
    val qs = Seq(0.01, 0.5, 0.95)
    val got = Quantile.quantilesDisc(df, "n", qs)
    assert(got == qs.map(q => (q, reference(values, q))))
  }

  test("property: arbitrary multisets and fractions match the reference " +
      "rank exactly") {
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))
      qs <- Gen.nonEmptyListOf(Gen.chooseNum(0.0, 1.0))
    } yield (vs, qs)
    for (i <- 0 until 12) {
      val (vs, qs) = gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse((List(1L), List(0.5)))
      val got = Quantile.quantilesDisc(vs.toDF("n"), "n", qs)
      assert(got == qs.map(q => (q, reference(vs, q))),
        s"seed $i: values=$vs qs=$qs")
    }
  }

  test("full long domain: extremes of both signs narrow without overflow") {
    val values: Seq[Long] = Seq(Long.MinValue, Long.MinValue + 1, -7L, 0L,
      3L, Long.MaxValue - 1, Long.MaxValue, 42L, -1000000000000L)
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val got = Quantile.quantilesDisc(values.toDF("n"), "n", qs)
    assert(got == qs.map(q => (q, reference(values, q))))
  }

  test("quantilesDiscDouble: bit-exact element selection across signs, " +
      "subnormal-to-huge magnitudes, -0.0, NaN exclusion") {
    val values: Seq[Double] = Seq(-1e300, -2.5, -1e-300, -0.0, 0.0,
      1e-300, 3.25, 1e300, 7.125, -42.0)
    def refD(vs: Seq[Double], q: Double): Double = {
      val sorted = vs.sortWith((a, b) =>
        java.lang.Double.compare(a, b) < 0) // IEEE order incl. -0.0 < 0.0
      sorted(math.max(1L, math.ceil(q * vs.size).toLong).toInt - 1)
    }
    val qs = Seq(0.1, 0.4, 0.5, 0.9, 1.0)
    val got = Quantile.quantilesDiscDouble(values.toDF("x"), "x", qs)
    for (((q, v), qq) <- got.zip(qs)) {
      assert(q == qq)
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(refD(values, q)),
        s"q=$q got=$v want=${refD(values, q)}")
    }
    // the -0.0 slot is preserved bit-exactly (q where rank hits -0.0)
    val zeros = Seq(-0.0, 0.0, 1.0)
    val z = Quantile.quantilesDiscDouble(zeros.toDF("x"), "x", Seq(1.0 / 3))
    assert(java.lang.Double.doubleToLongBits(z.head._2) ==
      java.lang.Double.doubleToLongBits(-0.0))
    // NaNs are excluded, not ranked
    val withNan = Seq(1.0, Double.NaN, 3.0).toDF("x")
    assert(Quantile.quantilesDiscDouble(withNan, "x", Seq(1.0)) ==
      Seq((1.0, 3.0)))
  }

  test("nulls are ignored; empty and out-of-range inputs reject") {
    val withNulls = Seq(Some(1L), None, Some(3L), None, Some(2L))
      .toDF("n")
    assert(Quantile.quantilesDisc(withNulls, "n", Seq(0.5)) ==
      Seq((0.5, 2L)))
    intercept[IllegalArgumentException] {
      Quantile.quantilesDisc(Seq.empty[Long].toDF("n"), "n", Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Quantile.quantilesDisc(Seq(1L).toDF("n"), "n", Seq(1.5))
    }
  }

  test("groupedQuantilesDisc matches the per-group reference rank, " +
      "single-element and duplicate-heavy groups included") {
    val data = Map(
      "en" -> Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L),
      "de" -> Seq(7L, 7L, 7L, 7L),
      "fr" -> Seq(42L))
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("lang", "n")
    val qs = Seq(0.5, 0.9)
    val got = Quantile.groupedQuantilesDisc(df, "lang", "n", qs)
      .as[(String, Double, Long)].collect().toSet
    val want = (for {
      (g, vs) <- data.toSeq; q <- qs
    } yield (g, q, reference(vs, q))).toSet
    assert(got == want)
  }

  test("property: grouped quantiles agree with per-group quantilesDisc") {
    val gen = for {
      groups <- Gen.chooseNum(1, 4)
      vs <- Gen.nonEmptyListOf(for {
        g <- Gen.chooseNum(0, groups - 1)
        v <- Gen.chooseNum(-500L, 500L)
      } yield (s"g$g", v))
    } yield vs
    for (i <- 0 until 8) {
      val vs = gen.apply(Gen.Parameters.default, Seed(100L + i))
        .getOrElse(List(("g0", 1L)))
      val qs = Seq(0.25, 0.5, 0.99)
      val got = Quantile.groupedQuantilesDisc(
        vs.toDF("g", "n"), "g", "n", qs)
        .as[(String, Double, Long)].collect().toSet
      val want = vs.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        qs.map(q => (g, q, reference(rows.map(_._2), q)))
      }.toSet
      assert(got == want, s"seed ${100 + i}")
    }
  }

  test("groupedQuantilesDiscLong matches the per-group reference on " +
      "wide-domain values (multi-pass narrowing per group)") {
    val data = Map(
      "a" -> Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue, 12345678901L),
      "b" -> Seq(5L, -5000000000L, 5L, 900000000000000L),
      "c" -> Seq(-7L))
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
    val qs = Seq(0.1, 0.5, 0.9)
    val got = Quantile.groupedQuantilesDiscLong(df, "g", "v", qs)
      .as[(String, Double, Long)].collect().toSet
    val want = (for {
      (g, vs) <- data.toSeq; q <- qs
    } yield (g, q, reference(vs, q))).toSet
    assert(got == want)
  }

  test("property: groupedQuantilesDiscLong agrees with the windowed " +
      "groupedQuantilesDisc on bounded domains") {
    val gen = for {
      groups <- Gen.chooseNum(1, 5)
      vs <- Gen.nonEmptyListOf(for {
        g <- Gen.chooseNum(0, groups - 1)
        v <- Gen.chooseNum(-100000L, 100000L)
      } yield (s"g$g", v))
    } yield vs
    for (i <- 0 until 6) {
      val vs = gen.apply(Gen.Parameters.default, Seed(300L + i))
        .getOrElse(List(("g0", 1L)))
      val qs = Seq(0.25, 0.5, 0.99)
      val df = vs.toDF("g", "v")
      val narrow = Quantile.groupedQuantilesDiscLong(df, "g", "v", qs)
        .as[(String, Double, Long)].collect().toSet
      val windowed = Quantile.groupedQuantilesDisc(df, "g", "v", qs)
        .as[(String, Double, Long)].collect().toSet
      assert(narrow == windowed, s"seed ${300 + i}")
    }
  }

  test("groupedQuantilesDiscDouble: bit-exact per-group element " +
      "selection across signs, subnormals and integer groups") {
    val data = Map(
      1 -> Seq(-1.5, 2.25, 0.0, -0.0, Double.MinPositiveValue, 3e300),
      2 -> Seq(1.125, 1.125, -2e-308),
      3 -> Seq(42.0))
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "x")
    val qs = Seq(0.5, 0.9)
    val got = Quantile.groupedQuantilesDiscDouble(df, "g", "x", qs)
      .as[(Int, Double, Double)].collect()
      .map { case (g, q, v) => ((g, q), v) }.toMap
    for ((g, vs) <- data; q <- qs) {
      val sorted = vs.sortWith { (a, b) =>
        // IEEE bit order (the operator's documented tiebreak for ±0.0)
        graft.operators.TopK.sortableBits(a) <
          graft.operators.TopK.sortableBits(b)
      }
      val want = sorted(math.max(1L, math.ceil(q * vs.size).toLong).toInt - 1)
      val v = got((g, q))
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(want), s"group $g q $q")
    }
    // group column keeps its original (integer) type
    val schema = Quantile.groupedQuantilesDiscDouble(df, "g", "x", qs).schema
    assert(schema("g").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("property: grouped double quantiles match a local per-group sort") {
    val gen = for {
      groups <- Gen.chooseNum(1, 4)
      vs <- Gen.nonEmptyListOf(for {
        g <- Gen.chooseNum(0, groups - 1)
        v <- Gen.oneOf(
          Gen.chooseNum(-1e6, 1e6),
          Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300, -1e300))
      } yield (s"g$g", v))
    } yield vs
    for (i <- 0 until 6) {
      val vs = gen.apply(Gen.Parameters.default, Seed(500L + i))
        .getOrElse(List(("g0", 1.0)))
      val qs = Seq(0.25, 0.5, 0.9)
      val got = Quantile.groupedQuantilesDiscDouble(
        vs.toDF("g", "x"), "g", "x", qs)
        .as[(String, Double, Double)].collect()
        .map { case (g, q, v) =>
          ((g, q), java.lang.Double.doubleToRawLongBits(v)) }.toMap
      for ((g, rows) <- vs.groupBy(_._1); q <- qs) {
        val sorted = rows.map(_._2).sortBy(graft.operators.TopK.sortableBits)
        val want =
          sorted(math.max(1L, math.ceil(q * rows.size).toLong).toInt - 1)
        assert(got((g, q)) ==
          java.lang.Double.doubleToRawLongBits(want),
          s"seed ${500 + i} group $g q $q")
      }
    }
  }

  test("grouped narrowing: nulls/NaNs ignored, empty input yields an " +
      "empty frame, fraction bounds reject") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(Double.NaN)),
      ("a", Some(2.0))).toDF("g", "x")
    val got = Quantile.groupedQuantilesDiscDouble(df, "g", "x", Seq(1.0))
      .as[(String, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 1.0, 2.0)))
    val empty = Quantile.groupedQuantilesDiscDouble(
      df.where(col("x") < 0), "g", "x", Seq(0.5))
    assert(empty.count() == 0L)
    // the empty frame keeps the DECLARED value type — the first-row sniff
    // this replaces typed it LongType, breaking unions with a non-empty
    // result of the same operator
    assert(empty.schema("value").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(empty.union(Quantile.groupedQuantilesDiscDouble(
      df, "g", "x", Seq(0.5))).count() == 1L)
    intercept[IllegalArgumentException] {
      Quantile.groupedQuantilesDiscLong(
        df.select(col("g"), lit(1L).as("v")), "g", "v", Seq(1.5))
    }
  }

  test("quantileFrame exposes (q, value) in fraction order") {
    val df = (1L to 100L).toDF("n")
    val got = Quantile.quantileFrame(df, "n", Seq(0.5, 0.9, 0.99))
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((0.5, 50L), (0.9, 90L), (0.99, 99L)))
  }
}
