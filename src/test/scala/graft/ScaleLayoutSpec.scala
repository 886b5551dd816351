package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.warehouse.Bucketing

/** Plan-shape evidence for the scale layouts: bucketed co-located joins
  * eliminate exchanges; salted joins keep results identical.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join with no exchange on the join key") {
    val wh = tmpDir("bucket_wh_")
    val li = SparkEntry.t(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val or = SparkEntry.t(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "g_li_b", s"$wh/g_li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(
      or.withColumnRenamed("o_orderkey", "l_orderkey"),
      "g_or_b", s"$wh/g_or_b", "l_orderkey", 4)

    // merge hints force the sort-merge plan a large fact-fact join takes
    // at scale (locally AQE would broadcast and skip bucketing entirely)
    val joined = Bucketing.read(spark, "g_li_b").hint("merge")
      .join(Bucketing.read(spark, "g_or_b").hint("merge"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs NO shuffle
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
    assert(joined.count() == li.count())

    // control: the same join on plain parquet shuffles both sides
    val plain = li.join(
      or.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange")
      || plain.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("salted join returns exactly the plain join result under skew") {
    // hot key: 5000 of 5020 rows share key 1
    val big = ((1 to 5000).map(i => (1L, i)) ++
      (1 to 20).map(i => (i.toLong + 1, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .orderBy("k", "v").collect()
    val plain = big.join(small, Seq("k"))
      .orderBy("k", "v").collect()
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 5002)

    // degenerate case: FULLY DUPLICATED hot rows must still spread over
    // salts (a row-content hash would collapse them to one)
    val dup = Seq.fill(4000)((1L, 7)).toDF("k", "v")
    val spread = dup
      .withColumn("_s", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(dup.col("k"),
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        org.apache.spark.sql.functions.lit(8L)))
      .select("_s").distinct().count()
    assert(spread > 1)
    assert(SkewJoin.saltedJoin(dup, small, "k", 8).count() == 4000)
  }
}
