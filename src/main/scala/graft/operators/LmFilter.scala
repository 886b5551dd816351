package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis => TA}

/** CCNet-style n-gram LM quality filtering: train hash-bucketed bigram
  * counts corpus-wide, score every document by its average per-bigram
  * negative log-probability (log-perplexity), and gate on a threshold —
  * the second filter stage (after heuristic rules) of essentially every
  * post-C4 corpus pipeline (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", which scores with a
  * 5-gram KenLM; the hash-bucketed bigram model here is the same operator
  * shape with a bounded, shuffle-friendly model).
  *
  * Model = two count tables over HASH BUCKETS, not raw n-grams:
  * `bucket(g) = md5prefix60(g) mod nBuckets`. Bucketing bounds the model
  * at `nBuckets` rows regardless of corpus size — the CCNet trick that
  * makes the model broadcastable at 100 TB (2^20 buckets x 16 B ≈ 16 MB)
  * while collisions only smooth counts, never lose them. Training is ONE
  * groupBy per table (map-side partial aggregation); scoring is two
  * broadcast joins plus a per-doc aggregate — no corpus self-join
  * anywhere, cost linear in total token count.
  *
  * Smoothing: add-one over the bucket space,
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + nBuckets)` — deterministic
  * integer counts, so the only float ops are one exact IEEE division and
  * one `ln` per bigram, rounded to 6 dp BEFORE the per-doc sum, which is
  * folded in DECIMAL(18,9) (exact, order-independent) — the oracle
  * determinism recipe every query here uses.
  */
object LmFilter {

  /** Demo-scale bucket space; raise to 2^20+ on a real corpus. */
  val DefaultBuckets: Int = 1 << 16

  /** Rounded-log-perplexity gate used by q68's `passes_lm` flag — set at
    * the corpus median (~7.63–7.66 at sf0.001–0.01) so the flag actually
    * partitions the synthetic corpus; a production run calibrates this
    * per-corpus exactly as CCNet does (tail percentile of the score).
    */
  val LogPplMax: Double = 7.65

  /** Rolling-hash modulus shared with the q38/q64 fingerprint machinery. */
  private val P = 2147483647L

  /** Exploded bigram occurrences (multiplicity KEPT — these are LM counts,
    * not shingle sets): `(doc_id, bgb, ctb)` = bigram bucket + context
    * (first-word) bucket. Docs with fewer than 2 tokens have no bigrams
    * and are excluded — a scored corpus filters them with the length rules
    * (q61) instead.
    *
    * Hashing is the dominant cost of LM scoring, so each TOKEN is md5'd
    * exactly once (native [[graft.plans.TextHashExprs.Md5Prefix60ArrayExpr]]
    * pass) and bigram buckets come from the 2-window rolling hash over
    * those token hashes (native, the q64 span machinery) — no per-gram
    * string concat, no second md5. Measured ~2x over the gram-string
    * variant at sf0.1.
    */
  def docBigramBuckets(docs: DataFrame, nBuckets: Int = DefaultBuckets)
      : DataFrame = {
    import graft.plans.TextHashExprs
    val th = TextHashExprs.md5Prefix60Array(TA.tokens(col("text")))
    docs
      .select(col("doc_id"), th.as("th"))
      .filter(size(col("th")) >= 2)
      .select(col("doc_id"), col("th"),
        TextHashExprs.windowedRollingHash(col("th"), 2).as("wh"))
      .select(col("doc_id"), col("th"),
        posexplode(col("wh")).as(Seq("pos", "ph")))
      .select(col("doc_id"),
        (col("ph") % nBuckets).as("bgb"),
        ((element_at(col("th"), col("pos") + 1) % P) % nBuckets).as("ctb"))
  }

  /** Bucketed bigram counts — the model numerator table (≤ nBuckets rows). */
  def bigramModel(bg: DataFrame): DataFrame =
    bg.groupBy(col("bgb")).agg(count(lit(1)).as("c_bg"))

  /** Bucketed context (unigram-prefix) counts — the denominator table. */
  def contextModel(bg: DataFrame): DataFrame =
    bg.groupBy(col("ctb")).agg(count(lit(1)).as("c_ctx"))

  /** Score `docs` against a model trained on `trainDocs` (defaults to
    * self-scoring, the corpus-filter configuration): per doc, the bigram
    * count and `log_ppl` = -(1/n) Σ round6(ln P(w2|w1)).
    */
  def scoreDocs(docs: DataFrame, trainDocs: DataFrame = null,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    val train = Option(trainDocs).getOrElse(docs)
    // Materialization barrier: tokenize+hash is the expensive pass and
    // has THREE consumers (two model groupBys + the scoring side). The
    // r21 shape relied on ReuseExchange over an explicit repartition —
    // but the scoring side's final per-doc join pushes IsNotNull(doc_id)
    // into ITS branch only, breaking canonical equality, and the
    // final-plan dump (r22, plans/r22/q75 'before') shows THREE separate
    // scans + md5 pipelines actually running. A lazy localCheckpoint
    // pins the slim (doc_id, bgb, ctb) rows once — every consumer reads
    // the same blocks, the tokenize pass runs exactly once, results
    // bit-identical. Partitioning by doc_id still pre-positions the
    // final per-doc aggregate.
    val bgTrain = docBigramBuckets(train, nBuckets)
      .repartition(col("doc_id"))
      .localCheckpoint(false)
    val bg =
      if (train eq docs) bgTrain
      else docBigramBuckets(docs, nBuckets).repartition(col("doc_id"))
        .localCheckpoint(false)
    // LEFT joins: bigrams/contexts unseen in training coalesce to count 0
    // (the add-one floor). Under self-scoring every bucket is present, so
    // this is exactly the oracle's inner `JOIN USING`.
    bg
      .join(broadcast(bigramModel(bgTrain)), Seq("bgb"), "left")
      .join(broadcast(contextModel(bgTrain)), Seq("ctb"), "left")
      .select(col("doc_id"),
        round(log((coalesce(col("c_bg"), lit(0L)) + 1).cast("double")
          / (coalesce(col("c_ctx"), lit(0L)) + nBuckets).cast("double")), 6)
          .as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp").cast("decimal(18,9)")).as("s"))
      // NO explicit round on the final average: the decimal sum and the
      // IEEE division are bit-identical in both engines, but round(x, 6)
      // tie-breaking is not (one sf0.1 doc landed exactly on a 5e-7
      // boundary) — emit the raw double and let any consumer quantize.
      .select(col("doc_id"), col("n_bigrams"),
        (-(col("s").cast("double") / col("n_bigrams"))).as("log_ppl"))
  }

  /** CCNet-style per-corpus threshold calibration: the cutoff that keeps
    * the best-scored `pct` of documents (CCNet computes per-language
    * percentiles of the KenLM score; this is that operator for one
    * corpus/language slice — call once per slice for the full recipe).
    *
    * EXACT rank semantics — the threshold is the `ceil(pct*n)`-th
    * smallest score, a data value — rather than an interpolated or
    * sketched quantile, so an oracle engine reproduces it bit-for-bit
    * (`percentile_approx`'s GK sketch is not cross-engine
    * deterministic). Distributed as a range-partitioned sort +
    * `zipWithIndex` (two jobs, no SinglePartition funnel, nothing wider
    * than the score column shuffles); use [[calibrateThresholdApprox]]
    * when a sketched cutoff is acceptable (single aggregate, no sort).
    */
  def calibrateThreshold(scored: DataFrame, pct: Double,
      scoreCol: String = "log_ppl"): Double = {
    require(pct > 0 && pct <= 1, s"pct must be in (0, 1], got $pct")
    val n = scored.count()
    // empty score table (every doc unscorable): "keep the best pct of
    // nothing" = keep nothing — a -Inf cutoff no score passes, NOT a
    // throw (a gated pipeline over a degenerate corpus slice must yield
    // an empty result, not abort)
    if (n == 0) return Double.NegativeInfinity
    val k = math.max(1L, math.ceil(pct * n).toLong)
    scored.select(col(scoreCol).cast("double").as(scoreCol))
      .orderBy(col(scoreCol))
      .rdd.zipWithIndex()
      .filter(_._2 == k - 1).map(_._1.getDouble(0)).first()
  }

  /** Per-GROUP calibration — the full CCNet recipe (per-language score
    * percentiles, Wenzek et al. §4.3): one exact rank cutoff per group,
    * as a (group, threshold) table to gate with. The cutoff is the
    * group's sorted multiset's element `max(1, ceil(pct·n))` — exactly
    * `quantile_disc(pct)` — computed by
    * [[Quantile.groupedQuantilesDiscDouble]]'s histogram narrowing: no
    * task ever holds a group's scores (the retired per-group
    * `row_number` window sorted each language's FULL score column
    * through one task — a 90 %-English corpus put 90 % of the rows
    * through a single partition). NULL groups and NaN scores are
    * excluded — slice before calibrating.
    */
  def calibrateThresholds(scored: DataFrame, pct: Double,
      groupCol: String, scoreCol: String = "log_ppl"): DataFrame = {
    require(pct > 0 && pct <= 1, s"pct must be in (0, 1], got $pct")
    Quantile.groupedQuantilesDiscDouble(
        scored.select(col(groupCol), col(scoreCol)),
        groupCol, scoreCol, Seq(pct))
      .select(col(groupCol), col("value").as("threshold"))
  }

  /** Sketched calibration for the 100 TB path: one
    * `percentile_approx` aggregate, no sort. Within the sketch accuracy
    * of [[calibrateThreshold]]; NOT oracle-reproducible across engines.
    */
  def calibrateThresholdApprox(scored: DataFrame, pct: Double,
      scoreCol: String = "log_ppl", accuracy: Int = 10000): Double =
    scored.agg(
      percentile_approx(col(scoreCol), lit(pct), lit(accuracy)))
      .head().getDouble(0)

  /** The curation gate: keep documents whose log-perplexity under the
    * corpus LM is at most `maxLogPpl` (semi join on the score — composes
    * with the q46 pipeline as an optional stage after the quality rules).
    * Docs without bigrams are dropped (unscorable).
    */
  def filterByPerplexity(docs: DataFrame, maxLogPpl: Double = LogPplMax,
      trainDocs: DataFrame = null, nBuckets: Int = DefaultBuckets)
      : DataFrame =
    docs.join(
      scoreDocs(docs, trainDocs, nBuckets)
        .filter(col("log_ppl") <= maxLogPpl)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
}
