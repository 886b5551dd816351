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

  test("bm25FromIndex == bm25 exactly (same rows, bit-identical " +
      "scores), incl. zero-hit docs excluded and topK cut") {
    // extra docs so candidates ⊂ corpus: several docs share no query term
    val corpus = docs.union(Seq(
      (4L, "unrelated words entirely"),
      (5L, "more filler text here"),
      (6L, "")).toDF("doc_id", "text"))
    val terms = Seq("spark", "slow", "scans")
    val full = TextRank.bm25(corpus, terms, topK = 20)
      .as[(Long, Double)].collect().toSeq
    val indexed = TextRank.bm25FromIndex(TextRank.termIndex(corpus),
        TextRank.docLengths(corpus), terms, topK = 20)
      .as[(Long, Double)].collect().toSeq
    assert(indexed == full)
    assert(full.nonEmpty && full.size < 7) // candidates really restricted
    // topK truncation agrees too
    val full1 = TextRank.bm25(corpus, terms, topK = 1)
      .as[(Long, Double)].collect().toSeq
    val idx1 = TextRank.bm25FromIndex(TextRank.termIndex(corpus),
        TextRank.docLengths(corpus), terms, topK = 1)
      .as[(Long, Double)].collect().toSeq
    assert(idx1 == full1 && idx1.size == 1)
  }

  test("bm25BatchFromIndex: a single ascending-term query equals the " +
      "per-query indexed path; queries stay independent in one batch") {
    val corpus = Seq(
      (1L, "join hash scan fast"), (2L, "hash hash slow"),
      (3L, "scan scan scan join"), (4L, "unrelated words here"),
      (5L, "slow join"), (6L, "hash"), (7L, "")).toDF("doc_id", "text")
    val terms = Seq("hash", "join") // ascending = batch sum order
    val single = TextRank.bm25FromIndex(TextRank.termIndex(corpus),
        TextRank.docLengths(corpus), terms, topK = 10)
      .as[(Long, Double)].collect().toSeq
    val batch2 = Seq((1, "hash"), (1, "join"), (2, "scan"))
      .toDF("query_id", "token")
    val got = TextRank.bm25BatchFromIndex(TextRank.termIndex(corpus),
        TextRank.docLengths(corpus), batch2, topK = 10)
      .orderBy("query_id", "rank")
      .as[(Int, Int, Long, Double)].collect().toSeq
    val q1 = got.filter(_._1 == 1).map(r => (r._3, r._4))
    assert(q1 == single, "batch query 1 == single-query indexed path")
    // query 2 is scored independently: candidates are scan-docs only
    val q2 = got.filter(_._1 == 2).map(_._3).toSet
    assert(q2 == Set(1L, 3L))
    // ranks are 1..k dense per query
    assert(got.filter(_._1 == 1).map(_._2) == (1 to q1.size))
  }

  test("invertedIndex: exact df, postings rank-truncated before " +
      "aggregation, numeric doc order") {
    // 'tok' in 12 docs (df 12, postings cut to 5); doc ids chosen so a
    // lexicographic sort would misorder (2 < 10 numerically, not as text)
    val ids = Seq(2L, 10L, 9L, 100L, 11L, 3L, 40L, 5L, 1L, 30L, 7L, 20L)
    val corpus = ids.map(i => (i, "tok tok common"))
      .toDF("doc_id", "text")
      .union(Seq((500L, "rare solo")).toDF("doc_id", "text"))
    val got = TextRank.invertedIndex(corpus, minDf = 2, maxPostings = 5)
      .as[(String, Long, String)].collect()
      .map { case (t, df, p) => t -> ((df, p)) }.toMap
    assert(got("tok") == ((12L, "1,2,3,5,7")))   // df exact, first 5 by id
    assert(got("common") == ((12L, "1,2,3,5,7")))
    assert(!got.contains("rare"))                // df 1 < minDf
    assert(!got.contains("solo"))
    // INT doc ids widen to long instead of failing the aggregate's
    // LongType contract (regression: the TopKAgg rewrite must not
    // narrow the accepted id types the window form handled)
    val intIds = ids.map(i => (i.toInt, "tok tok common"))
      .toDF("doc_id", "text")
    val gotInt = TextRank.invertedIndex(intIds, minDf = 2, maxPostings = 5)
      .as[(String, Long, String)].collect()
      .map { case (t, df, p) => t -> ((df, p)) }.toMap
    assert(gotInt("tok") == ((12L, "1,2,3,5,7")))
  }
}
