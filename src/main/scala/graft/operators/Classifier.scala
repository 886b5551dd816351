package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Hashing-trick linear text classifier — the fastText-style quality /
  * domain scorer every LLM data recipe runs over the raw crawl (a linear
  * model over hashed bag-of-words features, scored per document).
  *
  * The feature map is the classic hashing trick: token → bucket =
  * md5₆₀(token) mod `nBuckets`, so the model is a fixed-size weight
  * vector regardless of vocabulary size. Here the weights themselves are
  * derived IN-EXPRESSION from md5(seed:bucket) — a deterministic,
  * oracle-reproducible stand-in for trained parameters with the same
  * cost shape. Swapping in a real trained model changes only the weight
  * lookup: a broadcast join against an `nBuckets`-row table, bounded by
  * the model size, never the corpus.
  *
  * Scale posture: the entire score is ONE row-local higher-order
  * `aggregate` over the token array — no explode, no shuffle, no
  * broadcast, fully codegen'd. Scoring 100 TB is a map-only pass.
  * Integer-only arithmetic (60-bit md5 prefixes, mod, add), so scores
  * hash-compare exactly across engines — no libm, no floats.
  */
object Classifier {

  private def md60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-token signed weight in [-1000, 1000]: md5₆₀ of "seed:bucket". */
  private def weight(tok: Column, nBuckets: Int, seed: String): Column =
    md60(concat(lit(seed + ":"), (md60(tok) % nBuckets).cast("string"))) %
      2001 - 1000

  /** Document score: sum of hashed-bucket weights over all tokens (with
    * multiplicity — a linear model sees term frequency). Empty/blank
    * text scores 0.
    */
  def score(text: Column, nBuckets: Int = 4096,
      seed: String = "w"): Column = {
    val toks = filter(TextAnalysis.tokens(text), t => t =!= "")
    aggregate(toks, lit(0L), (acc, t) => acc + weight(t, nBuckets, seed))
  }

  /** Score every document and gate at `threshold`: returns
    * `(doc_id, score, kept)` with `kept` = 1 iff score ≥ threshold.
    */
  def scoreDocs(docs: DataFrame, nBuckets: Int = 4096, seed: String = "w",
      threshold: Long = 0L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        score(col(textCol), nBuckets, seed).as("score"))
      .withColumn("kept", (col("score") >= threshold).cast("int"))

  // ------------------------------------------------- trained-model path

  /** TRAIN the hashed linear model from labeled documents — one
    * distributed groupBy, deterministic by construction (the weights are
    * closed-form functions of exact per-bucket counts, so partitioning
    * and merge order cannot change them; no sequential SGD pass that
    * would need a fixed visit order). Input needs `labelCol` ∈ {0, 1};
    * every token occurrence (with multiplicity) votes its document's
    * label into its bucket, and
    *
    *   weight(bucket) = 2000 · pos / (pos + neg) − 1000   (integer, trunc)
    *
    * — an integer-scaled class-conditional rate in [−1000, 1000]: a
    * bucket whose occurrences all come from positive docs scores +1000,
    * all-negative −1000, balanced 0 (the same decision direction a
    * single-feature naive-Bayes log-odds would give, in exact integer
    * arithmetic both engines reproduce). Returns `(bucket, weight)` —
    * at most `nBuckets` rows, broadcastable by definition.
    *
    * Scale posture: explode is map-side; the only exchange is the
    * `(bucket, y)`-slim groupBy onto ≤ nBuckets keys. Training data at
    * any size funnels into a model-sized result.
    */
  def trainWeights(labeled: DataFrame, nBuckets: Int = 4096,
      labelCol: String = "label", textCol: String = "text"): DataFrame =
    labeled
      .select(col(labelCol).cast("long").as("y"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .select((md60(col("tok")) % nBuckets).as("bucket"), col("y"))
      .groupBy(col("bucket"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
      .select(col("bucket"),
        (expr("2000 * pos div (pos + neg)") - 1000L).as("weight"))

  /** Per-doc bucket contributions — the token-EXPENSIVE half of
    * [[trainWeights]], factored out so a streaming ingest can append it
    * incrementally ([[graft.streaming.StreamingIngest.trainDocBatch]]):
    * one `(doc_id, y, bucket, occ)` row per document × bucket. Keyed by
    * doc_id, so the indexDocBatch per-relation anti-join crash protocol
    * applies verbatim (pure per-bucket partial counts would not be
    * replay-dedupable — a re-delivered doc in a differently-composed
    * batch would double-count).
    */
  def bucketContribs(labeled: DataFrame, nBuckets: Int = 4096,
      labelCol: String = "label", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    labeled
      .select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("y"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"), col("y"),
        (md60(col("tok")) % nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("bucket"))
      .agg(count(lit(1)).as("occ"))

  /** Derive the `(bucket, weight)` model from a stored contributions
    * relation — one slim ≤nBuckets-key aggregate, so the model is
    * always-current without EVER re-tokenizing the training corpus:
    * `weightsFromContribs(bucketContribs(d)) == trainWeights(d)` exactly
    * (the weight is a closed-form function of exact additive counts).
    */
  def weightsFromContribs(contribs: DataFrame): DataFrame =
    contribs
      .groupBy(col("bucket"))
      .agg(sum(col("y") * col("occ")).as("pos"),
        sum((lit(1L) - col("y")) * col("occ")).as("neg"))
      .select(col("bucket"),
        (expr("2000 * pos div (pos + neg)") - 1000L).as("weight"))

  /** Score documents against a TRAINED `(bucket, weight)` table — the
    * path the in-expression md5 weights of [[scoreDocs]] stand in for.
    * Buckets absent from the table (tokens unseen in training) weigh 0;
    * token-free documents score 0 and still appear. Returns
    * `(doc_id, score, kept)` like [[scoreDocs]].
    *
    * Scale posture: the weight table is model-sized (≤ nBuckets rows) and
    * broadcast, so the token→weight lookup is map-side; the only corpus
    * exchanges are the `(doc_id, weight)`-slim partial-aggregated sum and
    * the slim left join putting empty docs back. Scoring 100 TB shuffles
    * doc-count rows, never token-count.
    */
  def scoreWithWeights(docs: DataFrame, weights: DataFrame,
      nBuckets: Int = 4096, threshold: Long = 0L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val buckets = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"), (md60(col("tok")) % nBuckets).as("bucket"))
    val scored = buckets
      .join(broadcast(weights.select(col("bucket"), col("weight"))),
        Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("weight"), lit(0L))).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("s"), lit(0L)).as("score"))
      .withColumn("kept", (col("score") >= threshold).cast("int"))
  }

  /** ZERO-SHUFFLE trained scoring: the weight table as an in-plan literal
    * array (index = bucket, like the BPE merge table rides the plan), so
    * the whole score is one row-local codegen'd HOF aggregate — scoring
    * is a map-only pass at any corpus size. Use when the model fits a
    * plan literal comfortably (it does: nBuckets longs); the broadcast
    * join of [[scoreWithWeights]] is the general form.
    */
  def scoreWithModel(docs: DataFrame, model: Array[Long],
      threshold: Long = 0L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val n = model.length
    val w = typedLit(model.toSeq)
    val toks = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    docs.select(col(idCol).as("doc_id"),
        aggregate(toks, lit(0L),
          (acc, t) => acc + element_at(w, (md60(t) % n).cast("int") + 1))
          .as("score"))
      .withColumn("kept", (col("score") >= threshold).cast("int"))
  }

  /** Collect a trained `(bucket, weight)` table into the dense array form
    * [[scoreWithModel]] takes (missing buckets → 0). Driver-side but
    * model-bounded: nBuckets longs, never corpus-sized.
    */
  def modelArray(weights: DataFrame, nBuckets: Int): Array[Long] = {
    val arr = new Array[Long](nBuckets)
    weights.select(col("bucket").cast("int"), col("weight").cast("long"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < nBuckets,
          s"weight bucket $b outside [0, $nBuckets) — the weight table " +
            "was trained with a different nBuckets than the scorer's")
        arr(b) = r.getLong(1)
      }
    arr
  }
}
