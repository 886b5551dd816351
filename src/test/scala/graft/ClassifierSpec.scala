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
