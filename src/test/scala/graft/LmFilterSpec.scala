package graft

import org.apache.spark.sql.functions._

import graft.operators.LmFilter

class LmFilterSpec extends SparkSpec {

  import spark.implicits._

  // 8 docs of a repetitive in-distribution phrase, 1 doc of bigrams seen
  // nowhere else, 1 unscorable single-token doc
  private def corpus = (
    (0L until 8L).map(i => (i, "the cat sat on the mat and the cat slept")) :+
      (8L, "zqx vbn mlk poi uyt rew qas zxc") :+
      (9L, "solo")
    ).toDF("doc_id", "text")

  test("LM scores: planted out-of-distribution doc has strictly higher " +
      "log-perplexity than every in-distribution doc") {
    val scores = LmFilter.scoreDocs(corpus, nBuckets = 1 << 16)
      .select("doc_id", "log_ppl").as[(Long, Double)].collect().toMap
    assert(!scores.contains(9L), "single-token doc is unscorable")
    val inDist = (0L until 8L).map(scores)
    assert(inDist.forall(_ < scores(8L)),
      s"gibberish doc must score worst: $scores")
    // identical docs score identically
    assert(inDist.distinct.size == 1)
  }

  test("perplexity gate keeps in-distribution docs, drops the outlier " +
      "and unscorable docs") {
    val scores = LmFilter.scoreDocs(corpus, nBuckets = 1 << 16)
      .select("doc_id", "log_ppl").as[(Long, Double)].collect().toMap
    val cut = (scores(0L) + scores(8L)) / 2
    val kept = LmFilter.filterByPerplexity(corpus, cut, nBuckets = 1 << 16)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 8L).toSet)
  }

  test("scoring against a separately trained model: unseen bigrams fall " +
      "back to the add-one floor (more perplex than trained ones)") {
    val train = corpus.filter(col("doc_id") < 8)
    val probe = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "totally novel words never trained")).toDF("doc_id", "text")
    val s = LmFilter.scoreDocs(probe, train, nBuckets = 1 << 16)
      .select("doc_id", "log_ppl").as[(Long, Double)].collect().toMap
    assert(s(100L) < s(101L))
  }
}
