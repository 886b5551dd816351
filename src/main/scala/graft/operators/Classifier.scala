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
}
