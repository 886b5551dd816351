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

  test("literal-arg validation errors are clear") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("literal int") ||
      e.getMessage.toLowerCase.contains("graft_minhash_sig"))
  }
}
