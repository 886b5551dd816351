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

  /** Materialized term index: `(doc_id, token, tf)` with multiplicity
    * counts — the relation [[bm25FromIndex]] retrieves from, built once
    * and persisted in a real deployment (the slim shape IS the point: at
    * 100 TB the index is a fraction of the corpus and the text column is
    * never touched again at query time). One `(doc_id, token)`-keyed
    * partial-aggregated shuffle.
    */
  def termIndex(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document token counts `(doc_id, dl)` — the index's companion
    * relation (BM25 length normalization needs every doc's length, and
    * the corpus D/avgdl statistics derive from it without re-reading
    * text). Map-only.
    */
  def docLengths(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("dl"))

  /** INDEX-BACKED [[bm25]]: same query contract, same scores to the last
    * bit, but retrieval instead of a corpus scan — candidates are the
    * documents with ≥ 1 indexed query-term hit (`score > 0` requires a
    * hit, and every hit's contribution is strictly positive, so the
    * candidate set and the full scan's output are provably equal; a
    * candidate's missing terms contribute an exact +0.0, leaving the
    * left-to-right double sum bit-identical).
    *
    * Scale posture: the term filter prunes the index to query-term rows
    * BEFORE any shuffle (predicate-pushdown territory when the index is
    * parquet bucketed/sorted by token); corpus statistics are one scalar
    * agg over the slim `docLens` relation plus per-term counts over the
    * pruned hits, broadcast as one row. The full-corpus tokenize-and-
    * score pass of [[bm25]] — its cost at 100 TB — is gone; what remains
    * is proportional to the query terms' posting sizes.
    */
  def bm25FromIndex(index: DataFrame, docLens: DataFrame,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val hits = index.filter(col("token").isin(terms: _*))
    val lenStats = docLens.agg(count(lit(1)).as("d"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfAggs = terms.map(t =>
      count(when(col("token") === t, lit(1))).as(s"df_$t"))
    val dfStats = hits.agg(dfAggs.head, dfAggs.tail: _*)
    val stats = lenStats.crossJoin(dfStats)
    val tfAggs = terms.map(t =>
      sum(when(col("token") === t, col("tf")).otherwise(lit(0L)))
        .as(s"tf_$t"))
    val cands = hits.groupBy(col("doc_id"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val withAll = cands.join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val idf = (col("d") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * ((tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
    }
    val score = terms.map(contrib).reduceLeft(_ + _) // left-to-right
    withAll.withColumn("score", score)
      .where(col("score") > 0)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** BATCH index-backed retrieval: score a TABLE of queries
    * `(query_id, token)` in ONE traversal of the term index — the
    * production retrieval shape (a query batch amortizes the index
    * pruning that [[bm25FromIndex]] plans per query). Per-query
    * semantics are [[bm25]] over the query's DISTINCT token set with
    * contributions summed in TOKEN-ASCENDING order: contributions are
    * collected per (query, doc), sorted, and folded left-to-right with
    * a HOF `aggregate` — a plain SUM over doubles would be
    * partial-aggregation-order-dependent and could never hash-compare
    * cross-engine. Missing terms contribute an exact +0.0, so the
    * candidate restriction (≥ 1 indexed hit) is lossless, as in
    * [[bm25FromIndex]].
    *
    * Scale posture: the query table broadcasts twice (its token set to
    * prune the index map-side, its (query, token) rows to fan hits out
    * per query); per-token df is a slim agg over the PRUNED hits and
    * broadcasts back. The only row-bearing shuffles are the pruned
    * hits ⋈ docLens equi-join and the (query, doc) contribution groupBy,
    * whose collect_list buffers hold ≤ |query terms| entries. Per-query
    * top-k rides the bounded double-score aggregate ([[TopK.TopKAgg]]),
    * so a hot query never sorts its full candidate set in one task.
    * Returns `(query_id, rank, doc_id, score)`.
    */
  def bm25BatchFromIndex(index: DataFrame, docLens: DataFrame,
      queries: DataFrame, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val q = queries.select(col("query_id"), col("token")).distinct()
    val lenStats = docLens.agg(count(lit(1)).as("d"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val hits = index.join(broadcast(q.select(col("token")).distinct()),
      Seq("token"), "left_semi")
    val dfByToken = hits.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val contribs = hits
      .join(broadcast(q), Seq("token"))
      .join(broadcast(dfByToken), Seq("token"))
      .join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(lenStats))
      .withColumn("contrib",
        ((col("d") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))))
    val scored = contribs
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("token"), col("contrib")))),
        lit(0.0), (acc, x) => acc + x("contrib")).as("score"))
    // rank on the ROUNDED score, exactly like bm25/bm25FromIndex's
    // orderBy(round(score, 6) desc, doc_id) — ranking raw doubles would
    // break sub-1e-6 near-ties differently than the single-query paths
    // and void the "per-query semantics are bm25" contract
    scored.groupBy(col("query_id"))
      .agg(TopK.topK(round(col("score"), 6),
        col("doc_id").cast("long"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }

  /** Inverted index with BOUNDED posting lists: for every token with
    * document frequency ≥ `minDf`, the exact df plus the first
    * `maxPostings` doc ids (ascending) as a comma-joined string.
    *
    * Scale posture: postings are truncated by the native bounded-buffer
    * top-k aggregate ([[TopK.TopKAgg]], score = −doc_id so ascending ids
    * win) — a stopword appearing in EVERY document costs `maxPostings`
    * buffer slots per partition and at most `maxPostings` pairs per
    * partition on the wire, never a corpus-sized group through one
    * task's sort (the previous `row_number` window form put exactly that
    * straggler on the hottest tokens — the ones an index is most queried
    * for — and the naive `collect_list`-then-`slice` is worse still,
    * materializing the full list in one aggregation buffer). Df rides
    * the SAME groupBy as a plain count — exact at any frequency — so the
    * distinct'd pair frame is shuffled once, not three times, and the
    * df⋈postings join is gone. Every shuffled row is `(token, doc_id)`
    * or a ≤`maxPostings` partial buffer.
    */
  def invertedIndex(docs: DataFrame, minDf: Long = 2,
      maxPostings: Int = 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // long cast: the bounded aggregate's id contract is LongType, and
    // NUMERIC posting order is this operator's documented contract
    // anyway (TextRankSpec) — integer ids widen losslessly
    val pairs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .distinct()
    pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        TopK.topK(-col("doc_id"), col("doc_id"), maxPostings).as("top"))
      .where(col("df") >= minDf)
      .select(col("token"), col("df"),
        array_join(transform(col("top"),
          p => p.getField("id").cast("string")), ",").as("postings"))
      .orderBy(col("token"))
  }
}
