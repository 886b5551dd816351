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

  test("calibrateThreshold: exact rank cutoff, gate keeps ~pct of docs") {
    // toy score table with known order statistics
    val toy = (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("doc_id", "log_ppl")
    assert(LmFilter.calibrateThreshold(toy, 0.3) == 3.0)  // ceil(3)=3rd
    assert(LmFilter.calibrateThreshold(toy, 0.25) == 3.0) // ceil(2.5)=3rd
    assert(LmFilter.calibrateThreshold(toy, 1.0) == 10.0)
    assert(LmFilter.calibrateThreshold(toy, 0.05) == 1.0) // k floors at 1
    intercept[IllegalArgumentException] {
      LmFilter.calibrateThreshold(toy, 0.0)
    }
    // empty score table -> keep-nothing cutoff, not a throw (the gated
    // pipeline must yield an empty result on a degenerate corpus slice)
    val thrEmpty = LmFilter.calibrateThreshold(
      toy.filter(col("log_ppl") < 0), 0.5)
    assert(thrEmpty == Double.NegativeInfinity)
    assert(toy.filter(col("log_ppl") <= thrEmpty).count() == 0)
    // on the real corpus: the threshold IS the k-th order statistic, and
    // the gate keeps exactly the scores <= it (this fixture's 8 identical
    // docs all tie AT the cutoff — ties keep together, by design)
    val scored = LmFilter.scoreDocs(corpus, nBuckets = 1 << 16)
    val all = scored.select("log_ppl").as[Double].collect().sorted
    val k = math.ceil(0.5 * all.length).toInt
    val thr = LmFilter.calibrateThreshold(scored, 0.5)
    assert(thr == all(k - 1), s"thr=$thr, expected ${all(k - 1)}")
    val kept = scored.filter(col("log_ppl") <= thr).count()
    assert(kept == all.count(_ <= thr).toLong)
    assert(kept >= k) // never keeps fewer than the target rank
    // a tie-free table keeps EXACTLY ceil(pct*n)
    val distinct = (1 to 40).map(i => (i.toLong, i * 0.37))
      .toDF("doc_id", "log_ppl")
    val thrD = LmFilter.calibrateThreshold(distinct, 0.3)
    assert(distinct.filter(col("log_ppl") <= thrD).count() == 12L)
    // the sketched variant lands within a rank or two on this tiny table
    val approx = LmFilter.calibrateThresholdApprox(distinct, 0.3)
    val keptApprox = distinct.filter(col("log_ppl") <= approx).count()
    assert(math.abs(keptApprox - 12L) <= 2)
  }

  test("calibrateThresholds: one exact per-group cutoff, gate keeps each " +
      "group's best pct") {
    // two groups with disjoint, known score ladders
    val toy = ((1 to 10).map(i => ("en", i.toLong, i * 1.0)) ++
      (1 to 4).map(i => ("de", 100L + i, 50.0 + i)))
      .toDF("lang", "doc_id", "log_ppl")
    val thr = LmFilter.calibrateThresholds(toy, 0.5, "lang")
      .as[(String, Double)].collect().toMap
    assert(thr == Map("en" -> 5.0, "de" -> 52.0))
    // per-group gate keeps exactly ceil(pct * groupN) on tie-free scores
    val kept = toy.join(LmFilter.calibrateThresholds(toy, 0.5, "lang")
        .withColumnRenamed("threshold", "t"), Seq("lang"))
      .filter(col("log_ppl") <= col("t"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept == Map("en" -> 5L, "de" -> 2L))
    // matches the single-group calibration when there is one group
    val en = toy.filter(col("lang") === "en")
    assert(thr("en") == LmFilter.calibrateThreshold(en, 0.5))
  }
}
