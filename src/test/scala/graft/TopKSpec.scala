package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {

  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopK.topK(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.score").as("s"), col("col.id").as("id"))
      .as[(String, Int, Long, Long)].collect().toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("g"), col("rank"), col("s"), col("id"))
      .as[(String, Int, Long, Long)].collect().toSet
  }

  test("topK matches the window-rank idiom, ties broken by id") {
    val rnd = new scala.util.Random(7)
    // small score range -> dense ties; 3 groups of uneven size
    val rows = (0L until 400L).map { id =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(12).toLong, id)
    }
    val df = rows.toDF("g", "s", "id")
    assert(viaAgg(df, 5) == viaWindow(df, 5))
    assert(viaAgg(df, 1) == viaWindow(df, 1))
    // k larger than any group: every row comes back, exactly ranked
    assert(viaAgg(df, 1000) == viaWindow(df, 1000))
  }

  test("result is independent of partitioning and merge order") {
    val rows = (0L until 300L).map(id => ("g", (id % 9), id))
    val df = rows.toDF("g", "s", "id")
    val a = viaAgg(df, 7)
    val b = viaAgg(df.repartition(23), 7)
    val c = viaAgg(df.repartition(1), 7)
    assert(a == b && b == c)
    assert(a == viaWindow(df, 7))
  }

  private def viaAggD(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopK.topK(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.score").as("s"), col("col.id").as("id"))
      .as[(String, Int, Double, Long)].collect().toSet

  private def viaWindowD(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("g"), col("rank"), col("s"), col("id"))
      .as[(String, Int, Double, Long)].collect().toSet
  }

  test("double scores: matches window-rank incl. negatives, ties, " +
      "±0.0 and infinities; values round-trip bit-exactly") {
    val rnd = new scala.util.Random(11)
    val vals = Array(-2.5, -1.0, -0.25, 0.0, 0.75, 1.5, 3.125,
      Double.NegativeInfinity, Double.PositiveInfinity)
    val rows = (0L until 300L).map { id =>
      (Seq("a", "b")(rnd.nextInt(2)), vals(rnd.nextInt(vals.length)), id)
    }
    val df = rows.toDF("g", "s", "id")
    assert(viaAggD(df, 6) == viaWindowD(df, 6))
    assert(viaAggD(df, 1) == viaWindowD(df, 1))
    // partitioning independence holds for doubles too
    assert(viaAggD(df.repartition(17), 6) == viaAggD(df, 6))
    // exact fractions above survive the sortable-bits round trip exactly
    // (the transform is a bijection, so this holds for EVERY double)
    val back = viaAggD(df, 1000).map(_._3)
    assert(back.subsetOf(vals.toSet))
  }

  test("double scores: NaN sorts above +Inf, deterministically") {
    // doubleToLongBits canonicalizes NaN: every NaN input compares equal,
    // ties fall to the id — the one deterministic total order available
    val df = Seq(("g", Double.NaN, 1L), ("g", Double.PositiveInfinity, 2L),
      ("g", 5.0, 3L), ("g", Double.NaN, 0L)).toDF("g", "s", "id")
    val got = df.groupBy(col("g"))
      .agg(TopK.topK(col("s"), col("id"), 3).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id")).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L))
  }

  test("buffer: insert past capacity keeps the k best, best-first") {
    val b = new TopK.TopKBuffer(3)
    Seq((5L, 10L), (7L, 2L), (5L, 3L), (9L, 99L), (5L, 4L), (9L, 1L))
      .foreach { case (s, id) => b.insert(s, id) }
    val got = (0 until b.n).map(i => (b.scores(i), b.ids(i)))
    assert(got == Seq((9L, 1L), (9L, 99L), (7L, 2L)))
  }
}
