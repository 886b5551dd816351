package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.plans.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("SQL-registered functions match the Column API") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
           graft_cosine(CAST(array(1.0, 2.0, 3.0) AS array<float>),
                        CAST(array(3.0, 2.0, 1.0) AS array<float>)) AS c,
           graft_md5_60(array('a', 'b'))[0] AS h,
           graft_simhash(graft_md5_60(array('x', 'y', 'x')), 60) AS sh,
           graft_minhash_sig(graft_md5_60(array('a')), 16)[1] AS m1,
           graft_lang_id(array('the', 'cat', 'is')) AS lang,
           graft_shingles(array('a', 'b', 'c', 'd'), 3) AS sh3
         """).head()
    // cross-check against the Column-API implementations
    val ref = Seq(("x")).toDF("x").select(
      VectorOps.cosine(
        typedLit(Seq(1.0f, 2.0f, 3.0f)), typedLit(Seq(3.0f, 2.0f, 1.0f)))
        .as("c"),
      graft.operators.Dedup.hash60(lit("a")).as("h")).head()
    assert(row.getDouble(0) == ref.getDouble(0))
    assert(row.getLong(1) == ref.getLong(1))
    assert(row.getSeq[String](5) == Seq("a b c", "b c d"))
    assert(row.getString(4) == "en")
  }

  test("SQL surface: graft_lsh_buckets and graft_kmv_distinct") {
    GraftFunctions.register(spark)
    // buckets: SQL == Column API, nTables-long array
    val vecs = (0L until 20L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("v")
    val sqlB = spark.sql(
      "SELECT vec_id, graft_lsh_buckets(embedding, 8, 3) AS b FROM v")
      .as[(Long, Seq[Long])].collect().toMap
    val colB = vecs.select(col("vec_id"),
      graft.plans.HyperplaneBucketsExpr.buckets(col("embedding"), 8, 3)
        .as("b")).as[(Long, Seq[Long])].collect().toMap
    assert(sqlB == colB)
    // KMV as a SQL aggregate: exact below k, grouped
    val est = spark.sql(
      """SELECT graft_kmv_distinct(graft_md5_60(array(CAST(id AS STRING)))[0], 64)
         FROM range(40)""").head().getDouble(0)
    assert(est == 40.0)
  }

  test("literal-arg validation errors are clear") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("literal int") ||
      e.getMessage.toLowerCase.contains("graft_minhash_sig"))
  }
}
