package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, KmvSketch}

class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  test("exact below k, stable estimate above k, merge-order invariant") {
    val small = (1 to 40).map(i => s"u$i").toDF("u")
      .select(Dedup.hash60(col("u")).as("h"))
    val exact = small.agg(KmvSketch.approxDistinct(col("h"))).head().getDouble(0)
    assert(exact == 40.0) // below k=64: exact

    val big = (1 to 5000).map(i => s"u$i").toDF("u")
      .select(Dedup.hash60(col("u")).as("h"))
    val est1 = big.repartition(1).agg(KmvSketch.approxDistinct(col("h")))
      .head().getDouble(0)
    val est8 = big.repartition(8).agg(KmvSketch.approxDistinct(col("h")))
      .head().getDouble(0)
    assert(est1 == est8) // semilattice state: partitioning cannot matter
    assert(math.abs(est1 - 5000) / 5000.0 < 0.35) // k=64 → ~12% stderr
  }

  test("property: buffer insert/merge == sorted-distinct-take-k reference " +
      "under random values, duplicates and partition splits") {
    import graft.operators.KmvSketch.KmvBuffer
    val k = 16
    (0 until 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(120)
      // small value range → plenty of duplicates; keep positive like hash60
      val values = Array.fill(n)(rnd.nextInt(80).toLong + 1)
      val reference = values.distinct.sorted.take(k).toSeq

      // single buffer, sequential inserts
      val b1 = new KmvBuffer(k)
      values.foreach(b1.insert)
      assert(b1.arr.take(b1.n).toSeq == reference, s"seed=$seed sequential")

      // random split into up to 4 partial buffers, merged in random order
      val parts = Array.fill(1 + rnd.nextInt(4))(new KmvBuffer(k))
      values.foreach(v => parts(rnd.nextInt(parts.length)).insert(v))
      val merged = new KmvBuffer(k)
      rnd.shuffle(parts.toSeq).foreach(merged.mergeFrom)
      assert(merged.arr.take(merged.n).toSeq == reference, s"seed=$seed merged")

      // serde round-trip via the aggregate's wire format
      val agg = graft.operators.KmvSketch.KmvDistinctAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
      val rt = agg.deserialize(agg.serialize(merged))
      assert(rt.arr.take(rt.n).toSeq == reference, s"seed=$seed serde")
      assert(rt.estimate == merged.estimate)
    }
  }

  test("duplicates do not change the sketch state") {
    def est(df: org.apache.spark.sql.DataFrame) =
      df.select(Dedup.hash60(col("u")).as("h"))
        .agg(KmvSketch.approxDistinct(col("h"))).head().getDouble(0)
    val distinctOnly = est((1 to 100).map(i => s"u$i").toDF("u"))
    val with50Copies = est(
      (1 to 100).flatMap(i => Seq.fill(50)(s"u$i")).toDF("u"))
    assert(with50Copies == distinctOnly) // multiplicity-invariant
    assert(math.abs(distinctOnly - 100) / 100.0 < 0.35)
  }
}
