package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-assembly operators for training-data preparation: packing
  * documents into fixed-length training contexts and deterministic
  * domain-mixture sampling.
  */
object Corpus {

  /** GPT-style sequence packing: concatenate all documents' tokens in
    * `idCol` order and chunk the stream into consecutive contexts of
    * `contextLen` tokens. Returns one row per (context, document) overlap:
    * `(chunk_id, doc_id, n_tokens)` — the loader's map of which documents
    * contribute how many tokens to which training context. Zero-token
    * documents occupy no context and are absent.
    *
    * The global running offset is the scale problem: a bare
    * `Window.orderBy(doc_id)` funnels the corpus through ONE partition
    * (the q48 trap). Instead the classic two-phase prefix sum:
    * range-partition by doc_id, per-partition token totals (collect is
    * ≤ numPartitions rows), broadcast the partition prefix offsets back,
    * and run the cumulative sum per-partition. Every shuffled row is
    * `(doc_id, n)` — two longs — regardless of corpus width, and no
    * single-partition stage exists at any size. The slim (doc_id, n, pid)
    * frame is localCheckpoint'ed so the sampled range boundaries cannot
    * drift between the offset job and the packing job.
    */
  def packContexts(docs: DataFrame, contextLen: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // LAZY pin: the per-partition totals collect right below is the
    // first action and materializes it — one driver-paced job, not two
    val ranged = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n"))
      .where(col("n") > 0)
      .repartitionByRange(p, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
    val perPid = ranged.groupBy(col("pid"))
      .agg(sum(col("n")).as("pn"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = perPid.map(_._1)
      .zip(perPid.map(_._2).scanLeft(0L)(_ + _))
    val offDf = broadcast(offsets.toSeq.toDF("pid", "pid_off"))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = lit(contextLen.toLong)
    ranged.join(offDf, Seq("pid"))
      .withColumn("start",
        col("pid_off") + coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("chunk_id", explode(sequence(
        expr(s"start div $contextLen"),
        expr(s"(start + n - 1) div $contextLen"))))
      .select(col("chunk_id"), col("doc_id"),
        (least((col("chunk_id") + 1) * c, col("start") + col("n"))
          - greatest(col("chunk_id") * c, col("start"))).as("n_tokens"))
      .orderBy(col("chunk_id"), col("doc_id"))
  }

  /** MATERIALIZED training contexts — the pipeline's terminal artifact:
    * where [[packContexts]] emits the (context, document) overlap MAP,
    * this emits the packed sequences themselves. Every document's token
    * stream is hashed to 60-bit integer ids (md5-prefix — the
    * deterministic stand-in a trained vocabulary swaps into),
    * concatenated in `idCol` order, chunked into `contextLen`-token
    * contexts, and returned one row per context:
    * `(context_id, n_tokens, ids_csv)` with the ids comma-joined in
    * stream order (the final context may be short).
    *
    * Scale posture: global offsets use the SAME two-phase prefix sum as
    * [[packContexts]] (no single-partition window at any size); the
    * explode is one slim `(pos, id)` row per corpus token — the
    * cardinality any tokenizer pass already touches — and the
    * context groupBy's sort_array buffer holds exactly `contextLen`
    * entries. Nothing driver-side except the ≤ numPartitions offset
    * totals.
    */
  def materializeContexts(docs: DataFrame, contextLen: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    materializeContextsIds(
      docs.where(length(trim(col(textCol))) > 0)
        .select(col(idCol).as("doc_id"),
          graft.plans.TextHashExprs.md5Prefix60Array(
            TextAnalysis.tokens(col(textCol))).as("ids")),
      contextLen)

  /** [[materializeContexts]] over PRE-TOKENIZED documents: `withIds`
    * carries `(doc_id, ids)` where `ids` is the 60-bit token-hash array
    * the text form derives internally. The seam exists for REPLICATED
    * streams (epoch mixtures, q117's shape): every copy of a document
    * has identical ids, so the caller hashes each document ONCE before
    * replication instead of once per epoch copy — at a 2–3× mixture
    * that is 2–3× less md5 work, the dominant cost of the tokenize
    * pass. Bit-identical to hashing after replication by construction.
    */
  def materializeContextsIds(withIds: DataFrame, contextLen: Int)
      : DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val spark = withIds.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // LAZY pin, as in [[packContexts]]: the totals collect materializes
    val ranged = withIds
      .select(col("doc_id"), col("ids"))
      .withColumn("n", size(col("ids")).cast("long"))
      .repartitionByRange(p, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
    val perPid = ranged.groupBy(col("pid"))
      .agg(sum(col("n")).as("pn"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = perPid.map(_._1)
      .zip(perPid.map(_._2).scanLeft(0L)(_ + _))
    val offDf = broadcast(offsets.toSeq.toDF("pid", "pid_off"))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(offDf, Seq("pid"))
      .withColumn("start",
        col("pid_off") + coalesce(sum(col("n")).over(w), lit(0L)))
      .selectExpr("start", "posexplode(ids) AS (i, tid)")
      .select((col("start") + col("i")).as("pos"), col("tid"))
      .withColumn("context_id", expr(s"pos div $contextLen"))
      .groupBy(col("context_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tid")))),
          x => x("tid").cast("string")), ",").as("ids_csv"))
      .orderBy(col("context_id"))
  }

  /** Deterministic domain-mixture sampling: keep each document with
    * per-stratum probability `rates(stratum)` (else `defaultRate`),
    * decided by a 60-bit md5 hash of the document id — no RNG state, so
    * the sample is reproducible run-to-run, engine-to-engine, and stable
    * under corpus repartitioning (the properties `df.sample` lacks).
    * This is the mixture-reweighting step of every LLM data recipe:
    * upsample high-quality domains, downsample the crawl tail.
    *
    * Scale posture: one map-side filter — the hash, the rate lookup
    * (broadcast of a |strata|-row table), and the compare are row-local;
    * no shuffle at all. Rates are applied as exact integer thresholds out
    * of 1e6, so the decision arithmetic is integer-only and
    * oracle-reproducible.
    */
  /** Epoch-weighted corpus REPLICATION — the upsampling half of a data
    * mixture, which [[mixtureSample]]'s keep-rates cannot express
    * (rates cap at 1.0): stratum weight `w` emits `floor(w)` copies of
    * every doc plus one more with probability `frac(w)`, decided by
    * the SAME integer md5 threshold as sampling — deterministic
    * run-to-run and engine-to-engine, stable under repartitioning.
    * This is the "epochs per domain" knob of an LLM data recipe
    * (upweight curated sources ~2–3×, downweight the crawl tail; a
    * weight < 1 degenerates to sampling). Returns the input rows with
    * a 0-based `epoch` copy index — the trainer-side repeat signal.
    *
    * Scale posture: one broadcast |strata|-row join + a row-local
    * `sequence`/`explode` — output-sized work, zero shuffle.
    */
  def epochReplicate(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double = 1.0, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight)
      .forall(w => w >= 0 && w <= 100), "weights in [0, 100]")
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.toSeq.map { case (s, w) =>
      (s, math.floor(w).toLong, math.round((w - math.floor(w)) * 1e6))
    }.toDF(strataCol, "base_n", "thr"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long") % lit(1000000L)
    val defBase = math.floor(defaultWeight).toLong
    val defThr = math.round((defaultWeight - math.floor(defaultWeight)) * 1e6)
    docs.join(wDf, Seq(strataCol), "left")
      .withColumn("n_copies",
        coalesce(col("base_n"), lit(defBase)) +
          when(bucket < coalesce(col("thr"), lit(defThr)), 1L)
            .otherwise(0L))
      .where(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("base_n", "thr", "n_copies")
  }

  def mixtureSample(docs: DataFrame, rates: Map[String, Double],
      defaultRate: Double, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = broadcast(rates.toSeq
      .map { case (s, r) => (s, math.round(r * 1e6)) }
      .toDF(strataCol, "thr"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long") % lit(1000000L)
    docs.join(rateDf, Seq(strataCol), "left")
      .where(bucket < coalesce(col("thr"), lit(math.round(defaultRate * 1e6))))
      .drop("thr")
  }

  /** TEMPERATURE-mixture sampling — the multilingual/multi-domain
    * rebalancing recipe (α-smoothing: sampling share ∝ n_g^α): per-group
    * keep rate `r_g = maxRate · (n_g / n_min)^(α−1)`, so the EXPECTED
    * kept count scales as n_g^α — α=1 keeps every group whole (no-op),
    * α→0 equalizes group sizes; the smallest group keeps `maxRate`
    * (upsampling beyond 1.0 is [[epochReplicate]]'s job — compose them
    * for the full recipe). Rates derive from ONE slim (group, count)
    * aggregate (bounded group cardinality — languages/sources, not ids);
    * the sample itself is [[mixtureSample]]'s deterministic md5-threshold
    * filter: zero extra shuffle, reproducible run-to-run and
    * engine-to-engine.
    *
    * α = 0.5 (the common choice) is computed through IEEE `sqrt`
    * (correctly rounded in every IEEE-754 engine), so the integer
    * thresholds reproduce bit-for-bit in a SQL oracle; other α ride
    * `math.pow`, where last-ulp differences between libm
    * implementations could flip a boundary doc.
    */
  def temperatureSample(docs: DataFrame, alpha: Double,
      maxRate: Double = 1.0, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    require(maxRate > 0 && maxRate <= 1, s"maxRate in (0, 1], got $maxRate")
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    if (counts.isEmpty) return docs.where(lit(false))
    val nMin = counts.values.min
    def rate(n: Long): Double =
      if (alpha == 0.5)
        maxRate * (math.sqrt(nMin.toDouble) / math.sqrt(n.toDouble))
      else maxRate * math.pow(n.toDouble / nMin.toDouble, alpha - 1.0)
    mixtureSample(docs, counts.map { case (g, n) => g -> rate(n) },
      defaultRate = 0.0, strataCol, idCol)
  }

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES):
    * the exact top-`k` rows by key `ln(u_i) / w_i` (equivalent order to
    * the classic `u^(1/w)`), where `u_i` is [[mixtureSample]]'s
    * deterministic md5 uniform shifted off zero (`(bucket + 0.5)/1e6`)
    * — a higher weight systematically pulls the key toward 0 (larger),
    * so inclusion probability scales with `w`, reproducibly run-to-run
    * and engine-to-engine. The quality-weighted corpus-subsampling
    * primitive ("sample 1M docs ∝ quality score").
    *
    * Scale shape: the key is a row-local expression; selection rides
    * the bounded-buffer [[TopK]] aggregate — at most k (key, id) pairs
    * per partition cross the shuffle, no global sort, no window. Rows
    * with null/non-positive weight are excluded (a zero weight has
    * key -∞; A-ES is undefined for negatives). Ties (astronomically
    * rare for continuous keys) break by smaller id, [[TopK]]'s rule.
    * Returns `(rank, id)` — the key itself is deliberately not emitted:
    * `ln` is not correctly-rounded across engines, and the ids are
    * last-ulp-stable while the raw keys are not.
    */
  // ===================== domain / URL curation ======================
  //
  // The source-level half of the C4/RefinedWeb recipe: document-level
  // dedup/quality decides WHICH page survives, domain curation decides
  // WHETHER a source may contribute at all (blocklists) and HOW MUCH
  // (per-domain caps against boilerplate farms). All relational — the
  // only subtlety is refusing the window-rank idiom for the cap, because
  // the web's head domain is exactly the hot group that straggles a
  // per-group sort.

  /** Multi-part public suffixes (the common ccTLD second-level set) for
    * [[domainOf]]'s registrable-domain cut. A full publicsuffix.org
    * table drops into the same membership literal.
    */
  private val MultiPartSuffixes = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.nz", "org.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn", "com.mx", "com.ar", "com.tr",
    "co.za", "org.za", "co.kr", "or.kr", "com.sg", "com.hk")

  /** Lower-cased host of a URL — the builtin `try_parse_url`
    * (row-local, no UDF), null for an unparseable URL (the plain
    * `parse_url` THROWS under ANSI — one malformed crawl URL would
    * kill the whole curation job).
    */
  def hostOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(try_parse_url(url, lit("HOST")))

  /** REGISTRABLE domain (eTLD+1): the last two host labels, or the last
    * three when the final two form a listed multi-part suffix —
    * `www.news.bbc.co.uk` → `bbc.co.uk`, `www.example.com` →
    * `example.com`. Subdomains (incl. `www.`) fall away by
    * construction. Single-label hosts (intranet names, IP fragments)
    * pass through unchanged; unparseable URLs are null. Pure column
    * expression — split/slice over a broadcast-literal suffix set,
    * whole-stage-codegen friendly, zero shuffle.
    */
  def domainOf(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val host = hostOf(url)
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = array_join(slice(parts, -2, 2), ".")
    val last3 = array_join(slice(parts, -3, 3), ".")
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, host)
      .when(last2.isin(MultiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Blocklist gate (true = keep): the document's registrable domain is
    * not in `blocked`. Built for [[graft.streaming.StreamingIngest
    * .curateDocBatch]]'s `gate` parameter — row-deterministic, so the
    * replay-idempotence contract holds. Unparseable URLs are dropped by
    * default (`keepUnparseable = true` admits them): a curation
    * pipeline treats "can't even tell the source" as failing the gate.
    * For a blocklist too large to inline as a literal, compose the same
    * semantics as a broadcast anti-join on [[domainOf]] instead.
    */
  def domainNotBlocked(url: org.apache.spark.sql.Column,
      blocked: Seq[String], keepUnparseable: Boolean = false)
      : org.apache.spark.sql.Column = {
    val dom = domainOf(url)
    when(dom.isNull, lit(keepUnparseable))
      .otherwise(!dom.isin(blocked: _*))
  }

  /** PER-DOMAIN CAP: keep at most `cap` documents per registrable
    * domain, deterministically — highest `priority` first, ties broken
    * by smaller doc id (the [[TopK]] total order, reproducible by
    * `row_number ... ORDER BY priority DESC, id` in any engine).
    * Returns `(domain, rank, idCol)`, rank 1-based within the domain.
    *
    * Scale shape: the bounded-buffer top-k aggregate, NOT a window —
    * at most `cap` `(priority, id)` pairs per domain per partition
    * cross the shuffle, so the head domain of a web crawl (easily 1%+
    * of all pages) costs `cap` buffer slots per task instead of a
    * single-task sort of its entire row set.
    */
  def perDomainCap(docs: DataFrame, urlCol: String, cap: Int,
      priority: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1 && cap <= (1 << 20),
      s"[graft] perDomainCap cap in [1, 2^20], got $cap")
    docs.select(domainOf(col(urlCol)).as("domain"),
        priority.as("__p"), col(idCol))
      .where(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(TopK.topK(col("__p"), col(idCol), cap).as("top"))
      .select(col("domain"), posexplode(col("top")))
      .select(col("domain"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol))
  }

  def weightedSample(docs: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && k <= (1 << 20),
      s"[graft] weightedSample k in [1, 2^20], got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long") % lit(1000000L) + lit(0.5)) / lit(1000000.0)
    val key = log(u) / col(weightCol).cast("double")
    docs.where(col(weightCol).cast("double") > 0)
      .agg(TopK.topK(key, col(idCol), k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol))
  }
}
