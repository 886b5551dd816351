package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Ranks

class RanksSpec extends SparkSpec {

  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    df.withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  test("percentRanks is bit-identical to the built-in window form, " +
      "duplicates, single-row groups and negatives included") {
    val df = Seq(
      ("a", 3.0, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L), ("a", -4.5, 4L),
      ("a", 3.0, 5L), ("b", 0.0, 6L), ("c", 7.0, 7L), ("c", 7.0, 8L))
      .toDF("g", "v", "id")
    val got = Ranks.percentRanks(df, "g", "v", "id", nBuckets = 4)
      .select(col("id"), col("pr"), col("cd"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val want = builtin(df).select(col("id"), col("pr"), col("cd"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got.keySet == want.keySet)
    for (id <- want.keySet) {
      assert(java.lang.Double.doubleToRawLongBits(got(id)._1) ==
        java.lang.Double.doubleToRawLongBits(want(id)._1), s"pr id=$id")
      assert(java.lang.Double.doubleToRawLongBits(got(id)._2) ==
        java.lang.Double.doubleToRawLongBits(want(id)._2), s"cd id=$id")
    }
  }

  test("property: arbitrary groups/values match the built-in bit-for-bit") {
    val gen = for {
      groups <- Gen.chooseNum(1, 4)
      vs <- Gen.nonEmptyListOf(for {
        g <- Gen.chooseNum(0, groups - 1)
        v <- Gen.chooseNum(-50, 50) // narrow domain → heavy duplicates
      } yield (s"g$g", v.toDouble))
    } yield vs
    for (i <- 0 until 6) {
      val vs = gen.apply(Gen.Parameters.default, Seed(700L + i))
        .getOrElse(List(("g0", 1.0)))
        .zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
      val df = vs.toDF("g", "v", "id")
      val got = Ranks.percentRanks(df, "g", "v", "id", nBuckets = 8)
        .select(col("id"), col("pr"), col("cd"))
        .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      val want = builtin(df).select(col("id"), col("pr"), col("cd"))
        .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      assert(got == want, s"seed ${700 + i}")
    }
  }

  test("NULL groups rank as their own partition, matching the built-in " +
      "window semantics (a plain equi-join would drop them)") {
    val df = Seq(
      (Option("a"), 3.0, 1L), (Option("a"), 1.0, 2L),
      (None: Option[String], 5.0, 3L), (None: Option[String], 2.0, 4L),
      (None: Option[String], 9.0, 5L), (Option("b"), 0.0, 6L))
      .toDF("g", "v", "id")
    val got = Ranks.percentRanks(df, "g", "v", "id", nBuckets = 4)
      .select(col("id"), col("pr"), col("cd"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val want = builtin(df).select(col("id"), col("pr"), col("cd"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got.keySet == want.keySet,
      "NULL-group rows must not be dropped by the cut/offset joins")
    assert(got == want)
  }

  test("the hot-group sort is split: no window partition carries the " +
      "whole group (plan has the bucketed partitionBy)") {
    val df = (1L to 1000L).map(i => ("hot", i * 0.001, i)).toDF("g", "v", "id")
    val plan = Ranks.percentRanks(df, "g", "v", "id")
      .queryExecution.optimizedPlan.toString
    // the data window must partition by (g, __bkt), not g alone
    assert(plan.contains("__bkt"),
      s"expected bucketed window partitioning in:\n$plan")
  }
}
