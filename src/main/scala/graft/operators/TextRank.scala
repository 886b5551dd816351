package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus term weighting and ranked retrieval: TF-IDF top terms per
  * document and BM25 scoring against a fixed term set.
  *
  * Both use the RATIONAL Robertson–Sparck-Jones idf
  * `(D - df + 0.5) / (df + 0.5)` rather than its logarithm: every
  * arithmetic step (int→double promotion, one subtraction, one addition,
  * one division) is IEEE-754-deterministic and reproduces bit-for-bit in
  * any engine, so results hash-compare against a SQL oracle — libm `ln`
  * carries no such cross-engine guarantee in the last ulp. The log is
  * monotone in the rational form, so rankings are unchanged.
  */
object TextRank {

  /** Top-`topK` TF-IDF terms per document:
    * `score = tf * ((D - df + 0.5) / (df + 0.5))` with ties broken by
    * token order. Returns `(doc_id, token, tf, df, score, rnk)`.
    *
    * Scale posture: tf is one `(doc_id, token)`-keyed partial-aggregated
    * shuffle; df aggregates the tf frame again by token (vocabulary-sized,
    * slim); the tf⋈df equi-join shuffles on token; the final window
    * partitions by doc_id. No corpus-width rows move — every shuffled row
    * is `(id, token, count)`. At web scale the vocabulary side stays a
    * shuffle join by design (billions of distinct tokens do not
    * broadcast).
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nDocs = docs.count()
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("token"))
      .withColumn("score",
        col("tf") * ((lit(nDocs.toDouble) - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** BM25 ranked retrieval for a FIXED ordered term set: per document,
    * `score = Σ_t idf_t * (tf_t·(k1+1)) / (tf_t + k1·((1-b) + b·(dl/avgdl)))`
    * summed in the GIVEN term order with explicit left-to-right
    * association, so the double addition sequence is identical in any
    * engine evaluating the same expression. Returns the `topK` documents
    * with nonzero score as `(doc_id, score)`.
    *
    * Scale posture: the corpus statistics (D, Σdl, per-term df) are ONE
    * scalar aggregation broadcast back via a 1-row cross join; tf and dl
    * are row-local array operations (zero shuffle); the only data
    * movement is the final global top-K sort, which Spark executes as
    * per-partition top-K + driver merge under the `limit`.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("dl"))
    val statAggs = count(lit(1)).as("d") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      terms.map(t => sum(when(array_contains(col("toks"), t), 1L)
        .otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val withStats = base.crossJoin(broadcast(stats))
    def contrib(t: String): Column = {
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      val idf = (col("d") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * ((tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
    }
    val score = terms.map(contrib).reduceLeft(_ + _) // left-to-right
    withStats.withColumn("score", score)
      .where(col("score") > 0)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Inverted index with BOUNDED posting lists: for every token with
    * document frequency ≥ `minDf`, the exact df plus the first
    * `maxPostings` doc ids (ascending) as a comma-joined string.
    *
    * Scale posture: the rank-then-truncate order matters — postings are
    * cut to `maxPostings` by a per-token `row_number` BEFORE any list is
    * materialized, so a stopword appearing in every document costs
    * `maxPostings` list slots, not a corpus-sized array in one
    * aggregation buffer (the naive `collect_list` then `slice` builds
    * the full list first and dies exactly on the tokens an index is most
    * queried for). Df is aggregated separately from the full pair set —
    * counts, not lists, so it stays exact at any df. Every shuffled row
    * is `(token, doc_id)` or `(token, count)`.
    */
  def invertedIndex(docs: DataFrame, minDf: Long = 2,
      maxPostings: Int = 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
    val dfreq = pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val rn = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val postings = pairs
      .withColumn("rn", row_number().over(rn))
      .where(col("rn") <= maxPostings)
      .groupBy(col("token"))
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings"))
    dfreq.where(col("df") >= minDf)
      .join(postings, Seq("token"))
      .select(col("token"), col("df"), col("postings"))
      .orderBy(col("token"))
  }
}
