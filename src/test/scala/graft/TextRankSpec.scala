package graft

import graft.operators.TextRank

class TextRankSpec extends SparkSpec {

  import spark.implicits._

  // token convention = TextAnalysis.tokens: lowercase, whitespace split
  private def toks(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private val docs = Seq(
    (0L, "spark joins hash joins"),
    (1L, "spark scans parquet"),
    (2L, "slow scans slow joins slow"),
    (3L, "spark spark spark")
  ).toDF("doc_id", "text")

  test("tfidfTopTerms matches brute-force rational-RSJ scoring") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val d = rows.size.toDouble
    val tf = rows.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
    }
    val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = tf.map { case (id, w, n) =>
      (id, w, n, dfreq(w),
        n * ((d - dfreq(w) + 0.5) / (dfreq(w) + 0.5)))
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, w, _, _, s) => (-s, w) }.take(2).zipWithIndex
        .map { case ((id, w, n, df, s), i) =>
          (id, w, n, df, BigDecimal(s).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1) }
    }.sortBy(r => (r._1, r._6))
    val got = TextRank.tfidfTopTerms(docs, topK = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    assert(got == want)
  }

  test("bm25 matches brute-force scoring and orders by score desc") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val d = rows.size.toDouble
    val dls = rows.map { case (id, t) => id -> toks(t).size.toDouble }.toMap
    val avgdl = dls.values.sum / d
    val terms = Seq("spark", "slow")
    val dfq = terms.map(t =>
      t -> rows.count { case (_, x) => toks(x).contains(t) }.toDouble).toMap
    def score(id: Long, text: String): Double =
      terms.map { t =>
        val tf = toks(text).count(_ == t).toDouble
        val idf = (d - dfq(t) + 0.5) / (dfq(t) + 0.5)
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls(id) / avgdl)))
      }.reduceLeft(_ + _)
    val want = rows.map { case (id, t) => (id, score(id, t)) }
      .filter(_._2 > 0)
      .map { case (id, s) => (id, BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }
    val got = TextRank.bm25(docs, terms, topK = 20)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("bm25 excludes zero-score docs and respects topK") {
    val got = TextRank.bm25(docs, Seq("parquet"), topK = 1)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L))
  }
}
