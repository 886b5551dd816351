package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the LLM-data-pipeline surface (north-star
  * extensions over the `documents` table): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting.
  *
  * Everything here composes `org.apache.spark.sql.functions` built-ins —
  * fully codegen'd, no UDFs, so the expressions stay inside whole-stage
  * codegen and scale linearly with no serialization boundary.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count: runs of letters, runs of digits, and individual
    * other non-space symbols each count as one token — a cheap, deterministic
    * proxy for byte-pair tokenizer counts.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern))

  /** Number of punctuation characters. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()\\[\\]{}-]"))

  /** Per-language stopword sets for the language-ID heuristic. Tiny,
    * deterministic, and expressible in plain SQL for the oracle.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "es", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("de", "le", "shi", "zai", "he", "you", "wo", "ta"))

  /** Count of tokens belonging to `words` (set-intersection size over the
    * distinct tokens — cheap: both arrays are small).
    */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(array_intersect(
      array_distinct(tokens(text)), array(words.map(lit): _*)))

  def stopwordCount(text: Column): Column =
    stopwordHits(text, Stopwords("en"))

  /** Language-ID: argmax of per-language stopword overlap, first language
    * (in `order`) wins ties, "und" (undetermined) when no overlap at all.
    *
    * Takes the DISTINCT TOKEN ARRAY, not the text: the hit expression is
    * referenced ~3x per language, so callers must materialize the token
    * array (exchange barrier) or pay repeated tokenization per reference.
    */
  def langIdFromTokens(
      distinctToks: Column,
      order: Seq[String] = Seq("en", "es", "de", "fr", "zh")): Column =
    graft.plans.TextHashExprs.langId(distinctToks, order, Stopwords)

  def langIdHeuristic(
      text: Column,
      order: Seq[String] = Seq("en", "es", "de", "fr", "zh")): Column =
    langIdFromTokens(array_distinct(tokens(text)), order)

  /** Quality-scoring signals (ratios are exact IEEE doubles of integer
    * counts, so they reproduce bit-for-bit in any engine).
    */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / length(text).cast("double")

  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double")
      / tokenCount(text).cast("double"))

  /** Composite quality score in [0,1]-ish: rewards stopword presence and
    * moderate token length, penalizes punctuation soup. Deterministic
    * arithmetic only (fixed association order).
    */
  def qualityScore(text: Column): Column =
    (stopwordRatio(text) * lit(0.5)) +
      (when(meanTokenLen(text).between(3.0, 10.0), lit(0.3))
        .otherwise(lit(0.0))) +
      (lit(0.2) - least(punctRatio(text) * lit(2.0), lit(0.2)))

  /** Canonical document fingerprint: md5 of the whitespace-normalized
    * lowercased text — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Word n-gram shingles (distinct), the unit of Jaccard/MinHash dedup.
    * Docs shorter than n tokens fall back to the single whole-text shingle
    * — the same contract as the native
    * [[graft.plans.TextHashExprs.ShinglesExpr]] (so tiny docs still dedup
    * exactly instead of vanishing from the candidate space).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = array_distinct(
      filter(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => when(size(toks) >= n,
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(grams)
  }
}
