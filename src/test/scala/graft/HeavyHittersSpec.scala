package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("property: misraGries(k) nominates every item with count > N/(k+1)") {
    val xsGen = Gen.listOf(Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.const("warm"),
      1 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val kGen = Gen.choose(2, 6)
    for (i <- 0 until 200) {
      val xs = xsGen(Gen.Parameters.default, Seed(i.toLong)).get
      val k = kGen(Gen.Parameters.default, Seed(1000L + i)).get
      val survivors = HeavyHitters.misraGries(xs.iterator, k).toSet
      val counts = xs.groupBy(identity).view.mapValues(_.size)
      val mustSurvive =
        counts.filter { case (_, n) => n > xs.size.toDouble / (k + 1) }.keys
      assert(mustSurvive.forall(survivors.contains),
        s"lost a heavy hitter: xs=$xs k=$k survivors=$survivors")
      assert(survivors.size <= k)
    }
  }

  test("heavyTokens output is EXACT: equals the plain groupBy threshold") {
    // skewed corpus: 'spark' dominates, midweight 'data', long uniform tail
    val docs = (0L until 60L).map { i =>
      val tail = s"tail${i % 37} word${i % 23} unique$i"
      (i, s"spark spark data $tail" + (if (i % 3 == 0) " spark data" else ""))
    }.toDF("doc_id", "text")
    val got = HeavyHitters.heavyTokens(docs, minFrac = 0.05)
      .as[(String, Long)].collect().toSeq
    // exact reference: full groupBy, no sketch
    val toks = docs.select(
      org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .where(org.apache.spark.sql.functions.col("t") =!= "")
      .as[String].collect().toSeq
    val thresh = math.ceil(0.05 * toks.size).toLong
    val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thresh).toSeq
      .sortBy { case (t, n) => (-n, t) }
    assert(got == want)
    assert(got.map(_._1).contains("spark"))
  }

  test("heavyTokens on a uniform corpus below threshold returns nothing") {
    val docs = (0L until 50L).map(i => (i, s"only$i distinct$i tokens$i"))
      .toDF("doc_id", "text")
    assert(HeavyHitters.heavyTokens(docs, minFrac = 0.02).count() == 0)
  }
}
