package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.TextHashExprs

/** Deduplication operators for the LLM-data-pipeline surface: exact
  * (fingerprint groupBy), MinHash+LSH near-dup, SimHash near-dup, and exact
  * n-gram Jaccard over LSH-restricted candidate pairs.
  *
  * Scale posture (100 TB): nothing here compares all pairs. Candidate
  * generation is LSH banding — explode each doc into `Bands` band keys,
  * shuffle by band key, and only join within buckets. The band join is a
  * plain equi-join, so Catalyst shuffles both sides on the key and AQE
  * handles skewed buckets. Everything row-local (shingles, signatures) is
  * built-in higher-order functions — codegen'd, no UDFs, no driver
  * collects.
  *
  * Determinism: all hashes derive from md5 (identical across engines); the
  * 60-bit prefix of the md5 hex fits a signed long, so the same SQL
  * reproduces signatures bit-for-bit in DuckDB (see NorthStar oracles).
  */
object Dedup {

  /** 60-bit hash: first 15 hex chars of md5, as a long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // -------------------------------------------------------------- exact

  /** Exact-dedup summary: one row per distinct normalized-text fingerprint
    * with the surviving (minimum) doc id and the group size. groupBy on the
    * md5 key — a single hash-partitioned aggregation, the canonical
    * shuffle-once exact dedup at any scale.
    */
  def exactDupGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
        col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ------------------------------------------------------------ MinHash

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleN = 3

  /** Distinct word 3-gram shingles; docs shorter than N tokens fall back to
    * the whole normalized text as a single shingle (so tiny docs still
    * dedup exactly).
    */
  def shingleSet(text: Column): Column =
    TextHashExprs.shingles(TextAnalysis.tokens(text), ShingleN)

  /** Parametrized MinHash over pre-computed shingle hashes: ONE md5 per
    * shingle (the expensive part, done upstream), then NumHashes cheap
    * integer hash functions derived from it:
    *   h_i(x) = ((2i+1) * (hash60(x) mod 2^31) + 10007*i) mod (2^31 - 1)
    * Signature component i = min over shingles of h_i. All-integer
    * arithmetic, identical in any engine (see NorthStar oracle).
    */
  val MinhashMod = 2147483647L // 2^31 - 1

  def minhashSignature(shingleHashes: Column): Column =
    TextHashExprs.minhashSig(shingleHashes, NumHashes)

  /** LSH band keys: md5 over each contiguous RowsPerBand-slice of the
    * signature (+ band index). Two docs share a band key iff that slice
    * matches exactly.
    */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => md5(concat(
        concat_ws(",", slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))),
        lit(":"), b.cast("string"))))

  /** doc_id, shingles, sig for a documents frame.
    *
    * The repartition between md5-hashing and signature derivation is a
    * deliberate materialization barrier: without it the shingle/md5
    * expression tree gets inlined into the signature lambda and the band-
    * key generator (both evaluated outside whole-stage codegen per band/
    * seed) — observed >100x slowdown at sf0.1. One small shuffle of
    * (doc_id, shingles, hashes) buys single-evaluation of the md5 work.
    */
  def signatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = shingleSet(col(textCol))
    // The up-front isnotnull filter is load-bearing for plan REUSE: the
    // downstream self-join pushes IsNotNull(doc_id) into its two sides but
    // not into the bucket-guard or payload branches, and that one-filter
    // difference breaks canonical equality — each branch then recomputes
    // this whole md5 pipeline. With the filter here, every consumer's
    // subtree canonicalizes identically and AQE reuses ONE shuffle stage.
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), sh.as("shingles"))
      .withColumn("hs", TextHashExprs.md5Prefix60Array(col("shingles")))
      .repartition(col("doc_id"))
      .withColumn("sig", minhashSignature(col("hs")))
  }

  /** One representative doc per normalized-text fingerprint (min id wins).
    *
    * Run this BEFORE near-dup at scale: real corpora carry huge exact-
    * duplicate clusters, and every doc in such a cluster lands in the SAME
    * LSH band buckets — a k-dup cluster alone makes k^2/2 candidate pairs.
    * Collapsing exact dups first caps that blowup at its source (the
    * groups are recoverable from [[exactDupGroups]]).
    */
  def representatives(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Candidate near-dup id pairs via LSH banding: explode band keys,
    * self-join on the key (shuffle by band key — bucket-local work only),
    * keep a_id < b_id, dedup pairs that collide in multiple bands.
    *
    * SLIM by design: only `(doc_id, bkey)` rides the `Bands`-times-exploded
    * band exchange — at corpus scale the dominant network cost of this
    * operator is that exchange, and carrying signatures + shingle arrays
    * through it multiplies the shuffled bytes by ~4x the corpus text. The
    * per-pair payloads (signatures for the estimate, shingles for exact
    * Jaccard) are re-joined BY ID against the surviving candidate pairs —
    * a vastly smaller set than the banded rows. The payload branch re-derives
    * from the same `sigs` plan; that trades a second map-side pass over
    * local data for a 4x cut of exchange bytes, the right trade when the
    * network, not CPU, is the 100 TB bottleneck.
    *
    * `maxBucketSize > 0` drops band buckets larger than the cap before the
    * join — the standard guard against degenerate buckets (boilerplate
    * headers, templated docs) whose pair count would otherwise be
    * quadratic. Dropped buckets are near-certain exact-dup clusters;
    * handle those with [[representatives]] + [[exactDupGroups]] first.
    */
  def lshCandidatePairs(sigs: DataFrame, maxBucketSize: Int = 0): DataFrame = {
    // Barrier on the band key: both sides of the self-join below share
    // this exact subtree, so ReuseExchange computes it once and the join
    // reads the same shuffle output twice. The merge hint keeps AQE from
    // broadcasting one side (which would break the reuse and recompute the
    // whole signature pipeline) — and a sort-merge bucket join is also the
    // plan this takes on a real cluster where neither side is small.
    val exploded = sigs
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("bkey"))
      .repartition(col("bkey"))
    val banded = dropOversized(exploded, Seq("bkey"), maxBucketSize)
    val a = banded.select(col("bkey"), col("doc_id").as("a_id"))
    val b = banded.select(col("bkey"), col("doc_id").as("b_id"))
    a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
  }

  /** Degenerate-bucket guard: drop rows of groups larger than the cap.
    * Implemented as an aggregate of the (normally EMPTY) oversized-key set
    * + broadcast anti-join — NOT a count window, which would sort every
    * banded row just to discover nothing is oversized (measured 2-4x on
    * the 20x stress corpus). The aggregate is map-side-combined on the
    * same partitioning as its input, so the common all-clear case costs
    * one cheap pass. No broadcast hint on the oversized side: it is
    * normally EMPTY (AQE folds the anti-join away entirely) but on an
    * adversarial corpus it is unbounded — runtime stats pick the strategy,
    * the same rule as the ledger anti-join.
    */
  private[operators] def dropOversized(
      df: DataFrame, keyCols: Seq[String], maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) df
    else {
      val keys = keyCols.map(col)
      val oversized = df.groupBy(keys: _*).count()
        .filter(col("count") > maxBucketSize)
        .select(keyCols.head, keyCols.tail: _*)
      df.join(oversized, keyCols, "left_anti")
    }

  /** Join one payload column of `sigs` onto both sides of an id-pair frame
    * (the re-join leg of the slim banding above).
    */
  private def joinPayload(
      pairs: DataFrame, sigs: DataFrame, payloadCol: String,
      aName: String, bName: String): DataFrame = {
    val av = sigs.select(col("doc_id").as("a_id"), col(payloadCol).as(aName))
    val bv = sigs.select(col("doc_id").as("b_id"), col(payloadCol).as(bName))
    pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
  }

  /** INCREMENTAL near-dedup: candidate id pairs that TOUCH a new batch —
    * new-vs-corpus plus new-vs-new — instead of re-running the full
    * corpus self-join on every ingest. Cost scales with |new| x bucket
    * occupancy, not |corpus|^2: the corpus side contributes only its slim
    * (doc_id, bkey) band index (at scale, persist `signatures()` once and
    * append per batch — this function only reads id+sig from it).
    *
    * Pair identity matches the batch recompute exactly: (min id, max id),
    * so `incrementalCandidatePairs(new, corpus)` ==
    * `lshCandidatePairs(corpus ∪ new)` restricted to pairs with a member
    * in `new` (asserted by DedupSpec). Ids must be disjoint across the
    * two frames (the ingest ledger guarantees that).
    */
  def incrementalCandidatePairs(
      newSigs: DataFrame, corpusSigs: DataFrame,
      maxBucketSize: Int = 0): DataFrame = {
    def bands(sigs: DataFrame, isNew: Boolean): DataFrame =
      sigs.select(col("doc_id"), explode(bandKeys(col("sig"))).as("bkey"))
        .withColumn("_new", lit(isNew))
    val all = bands(newSigs, isNew = true)
      .unionByName(bands(corpusSigs, isNew = false))
      .repartition(col("bkey"))
    // cap applies to the COMBINED bucket — a bucket already degenerate in
    // the corpus must not explode against every new doc either
    val banded = dropOversized(all, Seq("bkey"), maxBucketSize)
    val a = banded.select(col("bkey"), col("doc_id").as("a_id"),
      col("_new").as("a_new"))
    val b = banded.select(col("bkey"), col("doc_id").as("b_id"),
      col("_new").as("b_new"))
    a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("a_new") || col("b_new")) // only pairs touching the batch
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
  }

  /** The slim `(doc_id, bkey)` band-index rows for `docs` — the relation
    * a PERSISTENT candidate index stores per corpus member, appended once
    * per survivor batch instead of re-derived from the whole corpus every
    * batch (see [[incrementalJaccardDupPairsIndexed]]).
    */
  def bandIndexRows(docs: DataFrame): DataFrame =
    signatures(docs)
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("bkey"))

  /** [[incrementalJaccardDupPairs]] against a PERSISTED corpus band index
    * — the production form of streaming curation. The per-batch cost
    * drops from O(corpus) (tokenize+shingle+minhash the whole corpus to
    * rebuild its bands) to:
    *   - signatures over the BATCH only;
    *   - one slim bkey join of batch bands against the stored index
    *     (batch x bucket occupancy);
    *   - signatures over just the TOUCHED corpus partners (semi-join by
    *     candidate id) for the exact-Jaccard verify.
    * `corpusIndex` must equal `bandIndexRows(corpus)` (DedupSpec asserts
    * the equivalence of the two paths under exactly that contract; the
    * streaming writer maintains it transactionally).
    */
  def incrementalJaccardDupPairsIndexed(
      newDocs: DataFrame, corpus: DataFrame, corpusIndex: DataFrame,
      threshold: Double, maxBucketSize: Int = 0): DataFrame = {
    val newSigs = signatures(newDocs)
    val newBands = newSigs
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("bkey"))
      .withColumn("_new", lit(true))
    val all = newBands
      .unionByName(corpusIndex.select(col("doc_id"), col("bkey"))
        .withColumn("_new", lit(false)))
      .repartition(col("bkey"))
    val banded = dropOversized(all, Seq("bkey"), maxBucketSize)
    val a = banded.select(col("bkey"), col("doc_id").as("a_id"),
      col("_new").as("a_new"))
    val b = banded.select(col("bkey"), col("doc_id").as("b_id"),
      col("_new").as("b_new"))
    val pairs = a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("a_new") || col("b_new"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
      .localCheckpoint() // EAGER: both consumers sit in ONE action — a lazy pin lets the two stages race-compute the same partitions
    // exact-Jaccard verify: shingles from the batch side are already in
    // hand; the corpus side re-derives them ONLY for candidate partners
    val touched = pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
    val corpusTouchedSigs =
      signatures(corpus.join(touched, Seq("doc_id"), "left_semi"))
    val payload = newSigs.unionByName(corpusTouchedSigs)
    joinPayload(pairs, payload, "shingles", "a_sh", "b_sh")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental exact-Jaccard near-dup pairs touching `newDocs`:
    * the per-ingest-batch form of [[jaccardDupPairs]].
    */
  def incrementalJaccardDupPairs(
      newDocs: DataFrame, corpus: DataFrame, threshold: Double,
      maxBucketSize: Int = 0): DataFrame = {
    val newSigs = signatures(newDocs)
    val corpusSigs = signatures(corpus)
    val pairs =
      incrementalCandidatePairs(newSigs, corpusSigs, maxBucketSize)
    val payload = newSigs.unionByName(corpusSigs)
    joinPayload(pairs, payload, "shingles", "a_sh", "b_sh")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing minhash
    * components.
    */
  def estJaccard(aSig: Column, bSig: Column): Column =
    size(filter(zip_with(aSig, bSig, (x, y) => x === y), b => b))
      .cast("double") / NumHashes

  /** MinHash near-dup pairs with estimated Jaccard >= threshold. Only the
    * 16-long signatures are re-joined as payload — shingles never leave
    * their partition.
    */
  def minhashDupPairs(docs: DataFrame, threshold: Double,
      maxBucketSize: Int = 0): DataFrame = {
    val sigs = signatures(docs)
    joinPayload(lshCandidatePairs(sigs, maxBucketSize), sigs,
      "sig", "a_sig", "b_sig")
      .select(col("a_id"), col("b_id"),
        estJaccard(col("a_sig"), col("b_sig")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard over the LSH candidates (verification pass of the
    * classic two-stage near-dedup): |A ∩ B| / |A ∪ B| on shingle sets,
    * shingles joined by id onto the surviving pairs only.
    */
  def jaccardDupPairs(docs: DataFrame, threshold: Double,
      maxBucketSize: Int = 0): DataFrame = {
    val sigs = signatures(docs)
    joinPayload(lshCandidatePairs(sigs, maxBucketSize), sigs,
      "shingles", "a_sh", "b_sh")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------- exact-substring spans

  /** Shared w-token SPANS across documents — the exact-substring dedup
    * summary (the primitive behind "dedup at the sequence level", Lee et
    * al., Deduplicating Training Data Makes Language Models Better): every
    * w-token window's Rabin–Karp fingerprint
    * ([[graft.plans.TextHashExprs.WindowedRollingHashExpr]]), aggregated to
    * the fingerprints occurring in >= `minDocs` distinct documents, with
    * occurrence counts. Near-dup operators (MinHash/SimHash) see documents;
    * this sees boilerplate SEGMENTS inside otherwise-distinct documents —
    * licenses, headers, templated paragraphs — the spans a curation run
    * strips rather than dropping whole docs.
    *
    * Scale posture: the explode is one row per token occurrence — the
    * inherent cost of substring-level dedup (the alternative is a
    * distributed suffix array). The rows are slim (id, long); map-side
    * partial aggregation collapses within-partition repeats before the one
    * hash shuffle on span_hash; fingerprints are uniform so the shuffle
    * has no intrinsic skew (a boilerplate span with millions of
    * occurrences arrives pre-combined per map partition).
    */
  def sharedSpans(docs: DataFrame, w: Int, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        TextHashExprs.md5Prefix60Array(TextAnalysis.tokens(col(textCol)))
          .as("th"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(TextHashExprs.windowedRollingHash(col("th"), w))
          .as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** DECONTAMINATION: corpus documents sharing at least one w-token span
    * with a probe set (an eval benchmark, a holdout split) — the
    * train/test-overlap detector every serious training pipeline runs
    * before shipping a corpus. Returns (doc_id, n_shared_spans) for every
    * contaminated corpus doc.
    *
    * Scale posture: the probe side reduces to a DISTINCT span-hash set
    * (benchmark-sized — thousands of docs → ~10^6 longs), which AQE
    * broadcasts; the corpus side is the same slim one-row-per-token
    * explode as [[sharedSpans]] with per-partition dedup before the join,
    * so the corpus is never shuffled — one map-side hash-join pass +
    * a doc_id aggregation of the (tiny) hit set.
    */
  /** The (doc_id, span_hash) frame all three decontamination forms
    * share: per-doc DISTINCT w-token rolling-hash spans, one slim row
    * each (docs shorter than w tokens produce none).
    */
  private def docSpans(df: DataFrame, w: Int, textCol: String,
      idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        TextHashExprs.md5Prefix60Array(TextAnalysis.tokens(col(textCol)))
          .as("th"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(TextHashExprs.windowedRollingHash(col("th"), w))
          .as("span_hash"))
      .dropDuplicates("doc_id", "span_hash")

  def contaminatedDocs(corpus: DataFrame, probes: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val probeSpans = docSpans(probes, w, textCol, idCol)
      .select(col("span_hash")).distinct()
    docSpans(corpus, w, textCol, idCol).join(probeSpans, Seq("span_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
  }

  /** Per-document contamination FRACTION — the graded form of
    * [[contaminatedDocs]]'s count: of each corpus document's DISTINCT
    * w-token spans, the share present in the probe span set (0.0 when
    * none are, reported for EVERY doc with ≥ 1 span). A curation run
    * thresholds this ("drop documents with > X% benchmark overlap" —
    * the GPT-3-style graded rule) instead of dropping on any single
    * shared span.
    *
    * Scale posture identical to the binary form — slim (doc_id,
    * span_hash) rows, benchmark-sized distinct probe side for AQE to
    * broadcast — plus one extra count over the SAME span frame
    * (localCheckpoint barrier so tokenize+hash runs once, not twice)
    * and a left join of two doc-sized slim aggregates. The barrier
    * pins the span frame on executors for the operator's duration; on
    * a preemption-heavy cluster, trade it back for recompute (drop the
    * checkpoint — both aggregates are deterministic) or swap in a
    * reliable checkpoint dir, as [[dupClusters]] parameterizes.
    */
  def contaminationFraction(corpus: DataFrame, probes: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corpusSpans = docSpans(corpus, w, textCol, idCol).localCheckpoint() // EAGER: consumed twice within one action
    val probeSpans = docSpans(probes, w, textCol, idCol)
      .select(col("span_hash")).distinct()
    val totals = corpusSpans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    val shared = corpusSpans.join(probeSpans, Seq("span_hash"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    totals.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("frac",
        round(col("n_shared").cast("double") / col("n_spans"), 6))
  }

  /** [[contaminatedDocs]] with a BLOOM-FILTER prefilter on the corpus
    * side — same exact output (the final equi-join removes every bloom
    * false positive), different scale regime: when the benchmark span
    * set is too large to broadcast as exact longs (~8 B each), its Bloom
    * filter at `fpp` costs ~1.2 B/item and prunes the corpus spans
    * MAP-SIDE to `hits + fpp·|corpus spans|` rows before any join. The
    * exact-confirm join then runs over that residue only, so the pattern
    * stays exact while the broadcast shrinks ~7x and the join input by
    * `~1/fpp`. This is the sketch-prefilter + exact-confirm shape every
    * operator here uses for approximate structures (LSH → Jaccard,
    * IVF → exact cosine): the sketch bounds work, the confirm pass
    * guarantees the answer.
    */
  def bloomContaminatedDocs(corpus: DataFrame, probes: DataFrame, w: Int,
      fpp: Double = 0.01, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // benchmark-sized: re-deriving it for the confirm join is cheaper
    // than pinning executor storage for a query-shaped API
    val probeSpans = docSpans(probes, w, textCol, idCol)
      .select(col("span_hash")).distinct()
    val nProbe = math.max(1L, probeSpans.count())
    val bloom = probeSpans.stat.bloomFilter("span_hash", nProbe, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain =
      udf((h: Long) => bc.value.mightContainLong(h))
    docSpans(corpus, w, textCol, idCol)
      .where(mightContain(col("span_hash"))) // map-side sketch prune
      .join(probeSpans, Seq("span_hash")) // exact confirm
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
  }

  // ------------------------------------------- connected-component clusters

  /** Transitive-closure dedup clusters over verified near-dup pairs:
    * distributed connected components by ALTERNATING large-star / small-star
    * min-id propagation (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14), returning one `(doc_id, cluster_rep)` row per
    * node that appears in any pair, where `cluster_rep` is the minimum
    * doc id of the node's component.
    *
    * Why not greedy pair-drop: under chains (A~B, B~C, A≁C) dropping the
    * larger member of every pair can delete more than one-per-cluster and
    * cannot name the surviving representative. Cluster → min-id
    * representative is the decision an actual curation run executes.
    *
    * Scale posture: each iteration is TWO keyed shuffles of a slim
    * `(u: long, v: long)` edge list — no adjacency lists are ever
    * materialized wider than a groupBy(min) over one endpoint, no driver
    * union-find, no collected edges. The alternating star steps converge in
    * O(log n) iterations on any graph (vs O(diameter) for naive label
    * propagation — a 1M-doc boilerplate chain has diameter ~1M). Lineage is
    * truncated per iteration: by default with `localCheckpoint` (executor
    * block storage — fastest, but an executor loss mid-iteration loses the
    * blocks AND the truncated lineage, failing the job), or, when
    * `checkpointDir` is set, with a RELIABLE `checkpoint` to that
    * directory (HDFS/object store) so a 1000-executor run survives
    * preemption at the price of one slim edge-list write per round —
    * the SURVEY §8 swap, now a parameter instead of a comment.
    */
  /** large-star: every node links its LARGER neighbors to the minimum of
    * its closed neighborhood. Shuffle key: edge endpoint u. Every exchange
    * in this plan carries exactly the (u, v) long pair — the input frame
    * has no other columns to carry (DedupSpec asserts the schema + plan).
    */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(m, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** small-star: orient every edge (larger -> smaller); every node links
    * its smaller neighbors AND ITSELF to the minimum smaller neighbor.
    */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    oriented.join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(m.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  def dupClusters(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIters: Int = 25,
      checkpointDir: Option[String] = None,
      maxDriverEdges: Long = 100000L): DataFrame = {
    // per-iteration lineage barrier: local blocks by default, reliable
    // storage when a directory is given (executor-loss resilience)
    val barrier: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        pairs.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint(false)
    }
    // one-job convergence fingerprint: (count, order-independent XOR of
    // per-edge hashes — xor, not sum, which overflows under ANSI). A
    // changed edge set changes the fingerprint with overwhelming
    // probability; a freak collision would only stop iteration early, and
    // the downstream oracle-checked output would expose it — vs.
    // count+exceptAll this halves the per-iteration job count and drops a
    // shuffle.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    edges = barrier(edges)
    var fp = fingerprint(edges)
    var converged = fp._1 == 0L
    // BOUNDED-DRIVER fast path: near-dup edge lists are usually tiny
    // relative to the corpus (verified pairs above a high threshold),
    // and each distributed star round costs 2-3 driver-paced jobs
    // regardless of size — for a bounded edge count (16 B/edge; the
    // default cap collects at most ~1.6 MB) a driver union-find gives
    // the IDENTICAL min-id assignment with zero iterations. Large
    // graphs take the O(log n) alternating-star rounds exactly as
    // before (the 100 TB path; pass maxDriverEdges = 0 to force it).
    if (!converged && fp._1 <= maxDriverEdges) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      es.foreach { case (u, v) =>
        val ru = find(u); val rv = find(v)
        // always attach the larger root under the smaller: the final
        // root of every component IS its minimum id — the same
        // representative the star forest converges to
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val rows = es.iterator.flatMap(e => Iterator(e._1, e._2))
        .toSeq.distinct.map(n => (n, find(n)))
      return pairs.sparkSession.createDataFrame(rows)
        .toDF("doc_id", "cluster_rep")
    }
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = barrier(smallStar(largeStar(edges)))
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      iter += 1
    }
    require(converged, s"dupClusters did not converge in $maxIters iterations")
    // converged star forest: every edge is (member, component-min); the
    // representative itself appears only as a target, so add its self-row
    edges.select(col("u").as("doc_id"), col("v").as("cluster_rep"))
      .unionByName(
        edges.select(col("v").as("doc_id"), col("v").as("cluster_rep")))
      .distinct()
  }

  /** One-representative-per-cluster survivorship: the docs to KEEP after
    * transitive-closure dedup — everything except non-representative
    * cluster members. The anti-join side is the (typically small) member
    * list, left to AQE to broadcast when it is.
    */
  def clusterSurvivors(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val victims = dupClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as(idCol))
    docs.join(victims, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------ SimHash

  val SimHashBits = 60
  val SimHashBlocks = 4
  val BitsPerBlock: Int = SimHashBits / SimHashBlocks
  // Scale note: 4 blocks of 15 bits is the minimal-block (= maxHamming+1)
  // configuration, which maximizes bits/block and so minimizes candidate
  // pairs (~n^2/2^15 per block). Pushing further needs a WIDER hash
  // (e.g. 2x md5-60 for 120 bits -> 4x30-bit blocks); the 60-bit size here
  // is what stays bit-reproducible in the cross-engine oracle.

  /** 60-bit SimHash over the (multiplicity-preserving) token stream: bit i
    * is set iff the sum over tokens of ±1 (sign of bit i of the token's
    * hash60) is positive. Row-local, one aggregate per bit — stays in
    * whole-stage codegen.
    */
  def simhash(text: Column): Column =
    simhashFromHashes(
      TextHashExprs.md5Prefix60Array(TextAnalysis.tokens(text)))

  /** doc_id, simhash for a documents frame, with the materialization
    * barrier between token md5-hashing and the 60 bit-sum aggregates
    * (without it each bit aggregate re-evaluates the md5 array — 60x).
    */
  def simhashed(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextHashExprs.md5Prefix60Array(TextAnalysis.tokens(col(textCol)))
        .as("th"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), simhashFromHashes(col("th")).as("simhash"))

  /** SimHash from a pre-materialized per-token hash array (use this after
    * an exchange barrier so the md5 work is evaluated once, not once per
    * bit).
    */
  def simhashFromHashes(th: Column): Column =
    TextHashExprs.simhash(th, SimHashBits)

  // ---- wide (120-bit) simhash: the documented scale lever --------------

  /** doc_id, (sh1, sh2) — a 120-bit SimHash as two 60-bit halves over
    * independently-salted token hashes (md5(tok), md5(tok || "#2")). The
    * wider hash is THE lever the 60-bit configuration documents: with 120
    * bits, hamming<=3 blocking uses 4 blocks of THIRTY bits, so degenerate
    * candidate growth drops from ~n^2/2^15 to ~n^2/2^30 per block — 32k x
    * fewer block collisions on a random corpus — while staying bit-exactly
    * reproducible in the cross-engine oracle (two md5 prefixes).
    */
  def simhashedWide(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      TextHashExprs.md5Prefix60Array(toks).as("th1"),
      TextHashExprs.md5Prefix60Array(
        transform(toks, t => concat(t, lit("#2")))).as("th2"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        simhashFromHashes(col("th1")).as("sh1"),
        simhashFromHashes(col("th2")).as("sh2"))
  }

  /** Near-dup pairs under 120-bit SimHash hamming <= maxHamming (< 4),
    * pigeonhole-blocked on four 30-bit blocks (two per half). Same guard
    * and join shape as [[simhashDupPairs]]; COMPLETE for hamming <= 3 by
    * the pigeonhole principle (DedupSpec proves equality with the brute-
    * force pair set on a random fixture).
    */
  def simhashWideDupPairs(docs: DataFrame, maxHamming: Int,
      textCol: String = "text", idCol: String = "doc_id",
      maxBucketSize: Int = 0): DataFrame = {
    require(maxHamming < 4,
      "4x30-bit blocking only guarantees recall for hamming < 4")
    val hashed = simhashedWide(docs, textCol, idCol)
    val blockMod = 1L << 30
    val keys = array((0 until 4).map { b =>
      val half = if (b < 2) col("sh1") else col("sh2")
      concat(lit(s"$b:"),
        (shiftright(half, (b % 2) * 30) % blockMod).cast("string"))
    }: _*)
    val exploded = hashed.select(col("doc_id"), col("sh1"), col("sh2"),
      explode(keys).as("bkey"))
      .repartition(col("bkey"))
    val blocked = dropOversized(exploded, Seq("bkey"), maxBucketSize)
    val a = blocked.select(col("bkey"), col("doc_id").as("a_id"),
      col("sh1").as("a_sh1"), col("sh2").as("a_sh2"))
    val b = blocked.select(col("bkey"), col("doc_id").as("b_id"),
      col("sh1").as("b_sh1"), col("sh2").as("b_sh2"))
    a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_sh1").bitwiseXOR(col("b_sh1"))) +
          bit_count(col("a_sh2").bitwiseXOR(col("b_sh2")))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, blocked by
    * the pigeonhole principle: split the hash into SimHashBlocks blocks —
    * any pair within distance SimHashBlocks-1 must agree exactly on at
    * least one block, so the join key is (block index, block value).
    */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int,
      textCol: String = "text", idCol: String = "doc_id",
      maxBucketSize: Int = 0): DataFrame = {
    require(maxHamming < SimHashBlocks,
      s"blocking only guarantees recall for hamming < $SimHashBlocks")
    val hashed = simhashed(docs, textCol, idCol)
      .withColumnRenamed("simhash", "sh")
    // block keys are built per-block on the driver (block count is a
    // constant), so the shift amounts stay literal and codegen'd
    val keys = array((0 until SimHashBlocks).map { b =>
      concat(lit(s"$b:"),
        (shiftright(col("sh"), b * BitsPerBlock) % (1 << BitsPerBlock))
          .cast("string"))
    }: _*)
    val exploded = hashed.select(col("doc_id"), col("sh"),
      explode(keys).as("bkey"))
      .repartition(col("bkey"))
    // same degenerate-bucket guard as lshCandidatePairs: a block value
    // shared by k docs yields k^2/2 pairs — cap it (boilerplate/templated
    // corpora make single blocks collapse)
    val blocked = dropOversized(exploded, Seq("bkey"), maxBucketSize)
    val a = blocked.select(col("bkey"), col("doc_id").as("a_id"),
      col("sh").as("a_sh"))
    val b = blocked.select(col("bkey"), col("doc_id").as("b_id"),
      col("sh").as("b_sh"))
    a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** GENERIC 64-bit hamming near-dup pairs — the pairing stage for any
    * per-row 64-bit fingerprint (perceptual image hashes like dHash,
    * external SimHashes, feature sign-sketches). Pigeonhole blocking with
    * `maxHamming + 1` blocks: a pair within the distance budget must
    * agree exactly on at least one block, so candidates are
    * (block index, block value) groups and the exact `bit_count` XOR
    * verifies. Same shuffle discipline as [[simhashDupPairs]]: the
    * exploded exchange carries (id, hash, key) only, oversized buckets
    * are capped, and rows with a null hash (undecodable payloads) drop
    * out before blocking. Returns `(a_id, b_id, hamming)`.
    *
    * Block values mask with bitwiseAND (not `%`): the high block reaches
    * bit 63, where a sign-preserving remainder would split one bit
    * pattern into two keys and break the pigeonhole recall guarantee.
    */
  def hammingDupPairs(hashed: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", hashCol: String = "hash",
      maxBucketSize: Int = 0): DataFrame =
    hammingPairsCore(
      hashed.filter(col(hashCol).isNotNull)
        .select(col(idCol).as("hid"), col(hashCol).as("hh"),
          lit(true).as("_new")),
      maxHamming, maxBucketSize)

  /** INCREMENTAL [[hammingDupPairs]]: pairs touching the new batch only
    * (batch-batch and batch-corpus; corpus-corpus pairs were adjudicated
    * when those rows arrived). The corpus side needs nothing but its
    * stored `(id, hash)` rows — an 8-byte fingerprint IS its own slim
    * index, so unlike the vector path there is no separate bucket-index
    * relation to persist; re-deriving block keys from stored hashes is a
    * handful of shifts per row, not a dim-length projection.
    */
  def incrementalHammingDupPairs(newHashes: DataFrame,
      corpusHashes: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", hashCol: String = "hash",
      maxBucketSize: Int = 0): DataFrame = {
    def slim(df: DataFrame, isNew: Boolean): DataFrame =
      df.filter(col(hashCol).isNotNull)
        .select(col(idCol).as("hid"), col(hashCol).as("hh"),
          lit(isNew).as("_new"))
    hammingPairsCore(
      slim(newHashes, isNew = true)
        .unionByName(slim(corpusHashes, isNew = false)),
      maxHamming, maxBucketSize)
  }

  /** Shared blocking + verify for the hamming pairers: rows are
    * `(hid, hh, _new)`; only pairs with at least one `_new` side
    * survive. Block values mask with bitwiseAND (not `%`): the high
    * block reaches bit 63, where a sign-preserving remainder would split
    * one bit pattern into two keys and break the pigeonhole recall
    * guarantee.
    */
  private def hammingPairsCore(h: DataFrame, maxHamming: Int,
      maxBucketSize: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    // even bit distribution: the first (64 mod nBlocks) blocks get
    // ceil(64/nBlocks) bits, the rest floor(64/nBlocks) — every block
    // spans >= 1 real bit for any nBlocks <= 64, so the pigeonhole
    // guarantee holds for the whole parameter range (naive ceil-division
    // offsets would run past bit 63 for e.g. nBlocks = 9, leaving
    // zero-width trailing blocks and silently losing recall)
    require(maxHamming >= 0 && nBlocks <= 64,
      "need 0 <= maxHamming <= 63")
    val baseW = 64 / nBlocks
    val extra = 64 % nBlocks
    val widths = (0 until nBlocks).map(b => if (b < extra) baseW + 1 else baseW)
    val offsets = widths.scanLeft(0)(_ + _)
    val keys = array((0 until nBlocks).map { b =>
      val lo = offsets(b)
      val width = widths(b)
      val block =
        if (lo == 0 && width == 64) col("hh")
        else shiftrightunsigned(col("hh"), lo)
          .bitwiseAND(lit((1L << width) - 1))
      concat(lit(s"$b:"), block.cast("string"))
    }: _*)
    val exploded = h.select(col("hid"), col("hh"), col("_new"),
      explode(keys).as("bkey"))
      .repartition(col("bkey"))
    val blocked = dropOversized(exploded, Seq("bkey"), maxBucketSize)
    val a = blocked.select(col("bkey"), col("hid").as("a_id"),
      col("hh").as("a_hh"), col("_new").as("a_new"))
    val b = blocked.select(col("bkey"), col("hid").as("b_id"),
      col("hh").as("b_hh"), col("_new").as("b_new"))
    a.hint("merge").join(b.hint("merge"), Seq("bkey"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("a_new") || col("b_new"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hh").bitwiseXOR(col("b_hh"))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  // --------------------------------------------- segment (paragraph) dedup

  /** CCNet-style corpus-level duplicate-segment removal (Wenzek et al.:
    * CCNet hashes each PARAGRAPH and keeps one global copy, stripping
    * boilerplate headers/footers shared across pages; C4's three-sentence
    * span rule is the same operator). The unit here is a run of
    * `segTokens` whitespace tokens (a "paragraph" for corpora without
    * line structure; pass the natural separator split upstream when the
    * corpus has real paragraphs): each doc is cut into NON-overlapping
    * segments, every segment is 60-bit-hashed, and for each hash seen
    * more than once only the globally-first occurrence (minimum
    * `(doc_id, segpos)`) survives. Docs are reassembled from their
    * surviving segments in position order.
    *
    * Scale posture: the only corpus-wide exchanges are (1) one groupBy on
    * the 60-bit segment hash producing the ≤|distinct| `(h, first)` table
    * — filtered to hashes with count > 1, i.e. the boilerplate minority —
    * and (2) one equi-join of segment rows against that table (broadcast
    * it via `broadcastDups` when the boilerplate table is known small;
    * CCNet reports ~70% of paragraphs removed on raw CC, so the default
    * is a shuffle join). Reassembly groups each doc's own segments —
    * partition-local after the doc_id shuffle, state bounded by the
    * largest single doc. No driver collect, no self-join.
    *
    * Hash collisions (2^-60) conflate two distinct segments; both engines
    * group on the same hash, so results stay comparable (the same
    * trade-off every LSH operator here documents).
    */
  /** (doc_id, segs) — each doc cut into non-overlapping `segTokens`-token
    * segment strings via one higher-order transform (no per-token
    * explode); the last (possibly short) remainder is its own segment.
    * tokens() never yields an empty array (empty text → [""]) and NULL
    * text is coalesced to '' first (size(NULL) is -1 under legacy
    * sizeOfNull, which would flip sequence() descending), so sequence()
    * bounds are always ascending. SINGLE source of the segmentation
    * expression — segmentRows (→ q72/q77) and removeRepeatedSegments
    * (→ q76) must agree on segment boundaries byte-for-byte.
    */
  private def docSegs(docs: DataFrame, segTokens: Int,
      textCol: String, idCol: String): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val k = segTokens
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))).as("t"))
      .select(col("doc_id"),
        expr(s"""transform(
            sequence(0, cast(ceil(size(t) / $k.0d) as int) - 1),
            i -> concat_ws(' ', slice(t, i * $k + 1, $k)))""").as("segs"))
  }

  def segmentRows(docs: DataFrame, segTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docSegs(docs, segTokens, textCol, idCol)
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("segpos", "seg")))
      .withColumn("h", hash60(col("seg")))

  /** WITHIN-DOC repetition removal (the Gopher/C4 cleaning transform that
    * strips a document's own repeated spans, vs [[removeDuplicateSegments]]
    * which dedups across the corpus): each doc is cut into the same
    * non-overlapping `segTokens`-token segments and only the FIRST
    * occurrence of each distinct segment survives, in position order.
    *
    * Scale posture: entirely ROW-LOCAL — one higher-order-function pass
    * per document, no shuffle, no join, no state beyond the row. The
    * per-doc cost is O(nSegs² · segLen) worst case (the first-occurrence
    * scan), bounded by the document length, which is exactly the budget a
    * map-only cleaning pass owns. Same output shape as the corpus-level
    * operator so the two compose/gate interchangeably.
    */
  def removeRepeatedSegments(docs: DataFrame, segTokens: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    docSegs(docs, segTokens, textCol, idCol)
      // keep index i iff segs[i] does not occur among segs[0..i-1]
      // (array_position is 1-based over the length-i prefix slice; 0 =
      // absent). Spark [] indexing is 0-based; slice() is 1-based.
      .select(col("doc_id"), col("segs"),
        expr("""filter(sequence(0, size(segs) - 1),
            i -> array_position(slice(segs, 1, i), segs[i]) = 0)""")
          .as("ki"))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        size(col("ki")).cast("long").as("n_kept"),
        (size(col("segs")) - size(col("ki"))).cast("long").as("n_removed"),
        md5(expr("concat_ws(' ', transform(ki, i -> segs[i]))"))
          .as("cleaned_md5"))
  }

  /** Per-doc result of duplicate-segment removal: segment counts plus the
    * md5 of the reassembled (cleaned) text — the hash stands in for the
    * text so the result stays slim at any doc size. The reassembly is the
    * NORMALIZED text (tokens() lowercases and collapses whitespace before
    * segmenting), so `cleaned_md5` verifies the keep/drop decisions, not
    * the original byte stream; pass `emitCleaned = true` to also get the
    * reassembled `cleaned` column back for pipeline use (at the cost of
    * carrying full text through the final aggregation).
    */
  def removeDuplicateSegments(docs: DataFrame, segTokens: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      broadcastDups: Boolean = false,
      emitCleaned: Boolean = false): DataFrame = {
    val segs = segmentRows(docs, segTokens, textCol, idCol)
    // Keep/drop = "am I the minimum (doc_id, segpos) of my hash group?" —
    // a UNIQUE segment is trivially its own minimum, so no dup-count is
    // needed at all. Two physical shapes, same answer:
    //  - default: ONE window over h (single h-shuffle of the segment rows,
    //    single scan — replaced the groupBy+self-join form that scanned
    //    the corpus twice without being able to reuse the exchange, the
    //    consumers pruned different columns; measured 2.5 -> 1.5 s sf0.1);
    //  - broadcastDups: the dup table (hashes seen >1x, a minority even on
    //    raw CC) is built slim and BROADCAST, so the wide segment rows
    //    never shuffle on h — the at-scale shape when the boilerplate
    //    table fits an executor.
    val marked =
      if (broadcastDups) {
        val dupFirst = segs
          .groupBy(col("h"))
          .agg(count(lit(1)).as("c"),
            min(struct(col("doc_id"), col("segpos"))).as("first"))
          .filter(col("c") > 1)
          .select(col("h"), col("first"))
        segs
          .join(broadcast(dupFirst), Seq("h"), "left")
          .withColumn("kept", col("first").isNull ||
            (col("first.doc_id") === col("doc_id") &&
              col("first.segpos") === col("segpos")))
      } else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
        segs
          .withColumn("first",
            min(struct(col("doc_id"), col("segpos"))).over(w))
          .withColumn("kept",
            col("first.doc_id") === col("doc_id") &&
              col("first.segpos") === col("segpos"))
      }
    marked
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(col("kept").cast("long")).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("segpos"), col("seg"))))),
            s => s.getField("seg"))).as("cleaned"))
      .select(
        Seq(col("doc_id"), col("n_segs"), col("n_kept"),
          (col("n_segs") - col("n_kept")).as("n_removed"),
          md5(col("cleaned")).as("cleaned_md5")) ++
        (if (emitCleaned) Seq(col("cleaned")) else Nil): _*)
  }
}
