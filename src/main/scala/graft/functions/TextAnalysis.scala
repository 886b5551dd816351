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

  // ---- C4/Gopher corpus quality rules ---------------------------------
  // The published repetition/format filter set (Rae et al., "Scaling
  // Language Models: ... Gopher", §A1.1; Raffel et al., C4): duplicate
  // line/paragraph fractions, duplicate-line character fraction, top-2-gram
  // character fraction, symbol-to-word ratio, bullet/ellipsis line
  // fractions, alphabetic-word fraction. All composed built-ins — row-local,
  // codegen'd, shuffle-free; the per-doc folds run over a SORTED copy of
  // the line/gram array, and their run-length sums are order-independent,
  // so any engine reproduces them (the DuckDB oracle computes the same
  // values relationally via unnest + group-count).

  /** Trimmed non-empty lines. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), x => trim(x)), x => length(x) > 0)

  /** Trimmed non-empty paragraphs (blank-line separated). */
  def docParagraphs(text: Column): Column =
    filter(transform(split(text, "\\n\\s*\\n"), x => trim(x)),
      x => length(x) > 0)

  private def dupFraction(arr: Column): Column =
    when(size(arr) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(arr)).cast("double")
        / size(arr).cast("double"))

  /** Fraction of lines that are repeats of an earlier line. */
  def duplicateLineFraction(text: Column): Column =
    dupFraction(docLines(text))

  /** Fraction of paragraphs that are repeats. */
  def duplicateParagraphFraction(text: Column): Column =
    dupFraction(docParagraphs(text))

  /** Fraction of line CHARACTERS inside duplicated lines (all occurrences
    * of any line appearing >= 2 times), over total line characters. One
    * sorted fold, no shuffle: runs of equal lines contribute run*len.
    */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = array_sort(docLines(text))
    val total = aggregate(ls, lit(0L), (a, x) => a + length(x))
    val dup = aggregate(
      ls,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        val add = when(run === 2, length(x).cast("long") * 2)
          .when(run > 2, length(x).cast("long")).otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"),
          (acc.getField("dup") + add).as("dup"))
      },
      acc => acc.getField("dup"))
    when(total === 0, lit(0.0))
      .otherwise(dup.cast("double") / total.cast("double"))
  }

  /** Fraction of document characters covered by the most-repeated word
    * 2-gram (max over grams of occurrences x gram length, over the raw
    * text length) — the Gopher top-n-gram repetition signal. Same sorted
    * run-length fold as above.
    */
  def topBigramCharFraction(text: Column): Column = {
    val toks = tokens(text)
    val grams = when(size(toks) >= 2,
      array_sort(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
      .otherwise(array().cast("array<string>"))
    val best = aggregate(
      grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"),
            run * length(x).cast("long")).as("best"))
      },
      acc => acc.getField("best"))
    when(length(text) === 0, lit(0.0))
      .otherwise(best.cast("double") / length(text).cast("double"))
  }

  /** Symbol-to-word ratio: '#' and '...' occurrences per token. */
  def symbolToWordRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("#|\\.\\.\\.")).cast("double")
        / tokenCount(text).cast("double"))

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFraction(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, x => {
        val c0 = substring(x, 1, 1)
        c0 === "-" || c0 === "*" || c0 === "•"
      })).cast("double") / size(ls).cast("double"))
  }

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, x => x.endsWith("...")))
        .cast("double") / size(ls).cast("double"))
  }

  /** Fraction of tokens containing at least one alphabetic character. */
  def alphaWordFraction(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      size(filter(tokens(text), x => x.rlike("[a-z]"))).cast("double")
        / tokenCount(text).cast("double"))

  /** Published Gopher thresholds, shared with the oracle SQL. */
  val DupLineFracMax = 0.3
  val DupParaFracMax = 0.3
  val DupLineCharFracMax = 0.2
  val TopBigramCharFracMax = 0.2
  val SymbolWordRatioMax = 0.1
  val BulletLineFracMax = 0.9
  val EllipsisLineFracMax = 0.3
  val AlphaWordFracMin = 0.8

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
