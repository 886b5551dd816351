package graft

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def md60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def refScore(text: String, nBuckets: Int, seed: String): Long =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map { t =>
      md60(seed + ":" + (md60(t) % nBuckets).toString) % 2001 - 1000
    }.sum

  test("scoreDocs matches the sequential hashed-linear reference") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog",
      "foo foo foo bar",        // multiplicity: foo counts 3x
      "  Mixed   CASE   and	tabs  ",
      "",                        // blank → score 0
      "solo")
    val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Classifier.scoreDocs(docsDf, nBuckets = 64, seed = "s7",
        threshold = 0L)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refScore(t, 64, "s7")
      assert(got(i)._2 == want, s"doc $i")
      assert(got(i)._3 == (if (want >= 0) 1 else 0))
    }
    // multiplicity really is 3x the single-token weight
    val w = (t: String) => md60("s7:" + (md60(t) % 64)) % 2001 - 1000
    assert(got(1)._2 == 3 * w("foo") + w("bar"))
    assert(got(3)._2 == 0L)
  }

  // sequential reference for the TRAINED path: per-bucket (pos, neg)
  // occurrence counts -> weight = 2000*pos/(pos+neg) - 1000 (trunc)
  private def refTrain(rows: Seq[(String, Long)],
      nBuckets: Int): Map[Long, Long] = {
    val occ = rows.flatMap { case (text, y) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(t => (md60(t) % nBuckets, y))
    }
    occ.groupBy(_._1).map { case (b, g) =>
      val pos = g.count(_._2 == 1L).toLong
      b -> (2000L * pos / g.size - 1000L)
    }
  }

  test("trainWeights matches the sequential count reference and is " +
      "partitioning-independent") {
    val rows = Seq(
      ("good clean prose with varied words", 1L),
      ("good good spam spam spam", 0L),
      ("clean words again here", 1L),
      ("spam junk junk junk", 0L),
      ("", 1L)) // blank doc contributes nothing
    val df = rows.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "label")
    val want = refTrain(rows, 32)
    val got = Classifier.trainWeights(df, nBuckets = 32)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    val gotRep = Classifier.trainWeights(df.repartition(13), nBuckets = 32)
      .as[(Long, Long)].collect().toMap
    assert(gotRep == want)
    // an all-positive bucket scores +1000, all-negative -1000 (if the
    // fixture hashes them apart; 'clean' and 'junk' occur in one class)
    assert(got(md60("junk") % 32) == -1000L ||
      refTrain(rows, 32)(md60("junk") % 32) != -1000L)
    // the factored form is the identical model: contributions are exact
    // additive counts, weights a closed-form function of them
    val viaContribs = Classifier.weightsFromContribs(
      Classifier.bucketContribs(df, nBuckets = 32))
      .as[(Long, Long)].collect().toMap
    assert(viaContribs == want)
  }

  test("scoreWithWeights: trained-table scoring matches the sequential " +
      "reference; unseen buckets weigh 0; blank docs score 0") {
    val train = Seq(
      ("alpha beta alpha", 1L),
      ("gamma delta", 0L),
      ("alpha beta beta gamma", 1L))
    val trainDf = train.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "label")
    val w = Classifier.trainWeights(trainDf, nBuckets = 64)
    val wm = w.as[(Long, Long)].collect().toMap
    val score = Seq(
      (10L, "alpha alpha gamma"),  // trained tokens, multiplicity 2+1
      (11L, "neverseen tokens"),   // unseen -> 0 weights
      (12L, ""))                   // blank -> score 0, still present
      .toDF("doc_id", "text")
    val got = Classifier.scoreWithWeights(score, w, nBuckets = 64)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    def bw(t: String): Long = wm.getOrElse(md60(t) % 64, 0L)
    assert(got(0) == ((10L, 2 * bw("alpha") + bw("gamma"),
      if (2 * bw("alpha") + bw("gamma") >= 0) 1 else 0)))
    assert(got(1) == ((11L,
      bw("neverseen") + bw("tokens"),
      if (bw("neverseen") + bw("tokens") >= 0) 1 else 0)))
    assert(got(2) == ((12L, 0L, 1)))
    // in-plan literal-array scoring agrees with the broadcast join
    val arr = Classifier.modelArray(w, 64)
    val viaModel = Classifier.scoreWithModel(score, arr)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(viaModel.toSeq == got.toSeq)
  }

  test("score is threshold- and partitioning-independent (row-local)") {
    val docsDf = (0L until 200L).map(i => (i, s"tok$i word${i % 7} x"))
      .toDF("doc_id", "text")
    val a = Classifier.scoreDocs(docsDf).as[(Long, Long, Int)]
      .collect().toSet
    val b = Classifier.scoreDocs(docsDf.repartition(17))
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b)
    // both classes occur: the md5 weights are not degenerate
    assert(a.exists(_._3 == 1) && a.exists(_._3 == 0))
  }
}
