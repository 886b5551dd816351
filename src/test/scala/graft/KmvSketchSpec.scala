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
