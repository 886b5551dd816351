package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, same semantics:
  *  - [[knnBruteForce]]: the correctness baseline — broadcast the (small)
  *    query set against every candidate, rank by cosine. At scale this is
  *    one pass over the corpus per query batch, no shuffle of the big side
  *    (queries broadcast), then a per-query top-k via window — the right
  *    plan when the query set is small and the corpus is the 100 TB side.
  *  - [[knnLsh]]: the ANN scale path — random-hyperplane (sign) LSH
  *    restricts candidates to the query's bucket before ranking; the join
  *    becomes an equi-join on bucket id, so candidate generation shuffles
  *    only by bucket and never forms the full cross product.
  *
  * Arithmetic is a fixed-order double fold (VectorOps), reproducible
  * bit-for-bit in the DuckDB oracle.
  */
object Similarity {

  /** cosine rounded for engine-portable output. Uses the codegen'd native
    * expression — bit-identical to VectorOps.cosine for equal-length
    * arrays, but one fused loop per row instead of three interpreted
    * higher-order folds.
    */
  def cos6(a: Column, b: Column): Column =
    round(graft.plans.CosineSimilarityExpr.cosine(a, b), 6)

  /** Per-query top-k via the native bounded-buffer aggregate
    * ([[TopK.TopKAgg]], double scores through the order-preserving bit
    * transform — cosines round-trip bit-exactly). Same total order the
    * old `row_number().over(partitionBy(query_id).orderBy(cosine desc,
    * neighbor_id))` form produced, but the shuffle carries at most k
    * pairs per query per input partition instead of EVERY candidate row:
    * under brute-force kNN a query's window group is corpus-sized, and
    * that one-task sort is precisely the straggler the aggregate retires.
    */
  private def ranked(joined: DataFrame, k: Int): DataFrame =
    joined
      .groupBy(col("query_id"))
      // id cast: the aggregate's contract is LongType ids — integer id
      // columns (common in test frames) widen losslessly instead of
      // failing analysis as the raw column would. Null cosines (null
      // embeddings) are dropped by the aggregate: a null similarity is
      // no candidate, by design.
      .agg(TopK.topK(col("cosine"),
        col("neighbor_id").cast("long"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("neighbor_id"), col("col.score").as("cosine"))

  /** Exact top-k neighbors for each query vector (excluding self). */
  def knnBruteForce(vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"))
    val c = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    val joined = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** (table, bucket) candidate keys for every row: `nTables` sign-LSH
    * tables of `nPlanes` bits each, computed by the codegen'd
    * [[graft.plans.HyperplaneBucketsExpr]] in one fused pass. The composite
    * key space is `nTables * 2^nPlanes` — that is the join parallelism at
    * scale — while the OR over tables keeps recall that a single long code
    * would destroy.
    */
  private def withTableBuckets(df: DataFrame, idCol: String, vecCol: String,
      id: String, vec: String, nPlanes: Int, nTables: Int): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).as(vec),
      posexplode(graft.plans.HyperplaneBucketsExpr
        .buckets(col(vecCol), nPlanes, nTables)).as(Seq("t", "bucket")))

  /** Approximate top-k: only candidates sharing a `(table, bucket)` key
    * with the query are ranked. `nPlanes` controls per-table granularity
    * (2^nPlanes buckets/table); `nTables` is the OR-amplification width.
    */
  def knnLsh(vectors: DataFrame, queries: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = withTableBuckets(queries, idCol, vecCol, "query_id", "q_vec",
      nPlanes, nTables)
    val c = withTableBuckets(vectors, idCol, vecCol, "neighbor_id", "c_vec",
      nPlanes, nTables)
    val joined = c.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // a pair can collide in several tables — candidates are a set
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** Multiprobe ANN: like [[knnLsh]] but each query also probes, per
    * table, the nPlanes buckets at Hamming distance 1 from its own (flip
    * one hyperplane sign) — the standard recall fix for sign-LSH without
    * more hash tables. Candidates grow ~(nPlanes+1)x per query; the corpus
    * side stays (table,bucket)-partitioned, queries broadcast.
    */
  def knnLshMultiprobe(vectors: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int, nTables: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = withTableBuckets(queries, idCol, vecCol, "query_id", "q_vec",
      nPlanes, nTables)
      .withColumnRenamed("bucket", "qbucket")
      .withColumn("bucket", explode(array(
        col("qbucket") +: (0 until nPlanes).map(p =>
          col("qbucket").bitwiseXOR(lit(1L << p))): _*)))
      .drop("qbucket")
    val c = withTableBuckets(vectors, idCol, vecCol, "neighbor_id", "c_vec",
      nPlanes, nTables)
    val joined = c.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** IVF-style ANN with a TRAINED coarse quantizer: `trainIters` Lloyd
    * (k-means) iterations over a deterministic sample refine the first-
    * `nCentroids`-vectors seed, then every vector is assigned to its
    * max-cosine cell (the inverted lists) and each query probes its
    * `nProbe` nearest cells. All relational: training cross-joins the
    * SAMPLE (bounded, driver-chosen) against the tiny broadcast centroid
    * set; assignment is one broadcast cross-join + per-id argmax; candidate
    * generation is an equi-join on cell id — never the full cross product.
    * The cell assignment is computed once and reusable as a materialized
    * index table at scale.
    *
    * Determinism (oracle-reproducible, see NorthStar q44): centroid means
    * are per-dimension double folds in sample-id order; assignment argmax
    * ties break by centroid id; empty cells keep their previous centroid.
    * Per-iteration centroids are collected to the driver (nCentroids x dim
    * doubles) and re-broadcast as literals, so the plan depth stays flat.
    */
  /** Train the IVF coarse quantizer: `trainIters` Lloyd (k-means)
    * iterations over the deterministic `idCol < trainSample` sample,
    * seeded with the first `nCentroids` vectors. Returns the (cid, ce)
    * centroid frame (ce is array<double>). 0 iterations = the raw seeds.
    *
    * Determinism (oracle-reproducible): centroid means are per-dimension
    * double folds in sample-id order; assignment argmax ties break by
    * centroid id; empty cells keep their previous centroid. Per-iteration
    * centroids are collected to the driver (nCentroids x dim doubles) and
    * re-broadcast as literals, so plan depth stays flat.
    */
  def ivfCentroids(vectors: DataFrame, nCentroids: Int, trainIters: Int,
      trainSample: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    def toD(c: Column): Column = transform(c, _.cast("double"))
    val seeds: Seq[(Int, Seq[Double])] = vectors
      .filter(col(idCol) < nCentroids)
      .select(col(idCol).cast("int").as("cid"), toD(col(vecCol)).as("ce"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
      .toSeq
    val sample = vectors.filter(col(idCol) < trainSample)
      .select(col(idCol).as("sid"), col(vecCol).as("sv"))
    var cents = seeds
    var it = 0
    while (it < trainIters) {
      // row-local nearest-centroid assignment (narrow, codegen'd) — same
      // argmax/tiebreak contract as a (cosine DESC, cid) row_number
      val assigned = sample.withColumn("cid",
        graft.plans.ArgmaxCosineExpr.assign(col("sv"),
          cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))
        .select(col("cid"), col("sid"), col("sv"))
      // per-(cell, dim) mean as an id-ordered sequential double fold —
      // the exact arithmetic the DuckDB oracle replays
      val means: Map[Int, Seq[Double]] = assigned
        .select(col("cid"), col("sid"),
          posexplode(toD(col("sv"))).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("cnt"),
          aggregate(
            transform(array_sort(collect_list(struct(col("sid"), col("v")))),
              x => x.getField("v")),
            lit(0.0), (acc, x) => acc + x).as("sm"))
        .select(col("cid"), col("pos"), (col("sm") / col("cnt")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
      cents = cents.map { case (cid, prev) =>
        cid -> means.getOrElse(cid, prev) }
      it += 1
    }
    cents.toDF("cid", "ce")
  }

  /** The inverted lists: every vector assigned to its max-cosine centroid
    * cell (cid tiebreak). At scale this is the index you materialize once
    * and reuse across query batches.
    *
    * The assignment is a NARROW codegen'd projection
    * ([[graft.plans.ArgmaxCosineExpr]] against the driver-resident
    * centroid set) — not a crossJoin + window, which would explode the
    * corpus k-fold through a shuffle just to pick one row back per vector.
    */
  def ivfIndex(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col("cid").cast("int"), col("ce"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    vectors.select(
      graft.plans.ArgmaxCosineExpr.assign(col(vecCol),
        cents.map(_._1), cents.map(_._2)).as("cid"),
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
  }

  def knnIvf(vectors: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, trainIters: Int = 2,
      trainSample: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents2 =
      ivfCentroids(vectors, nCentroids, trainIters, trainSample, idCol, vecCol)

    // ---- assign + probe + rank against the trained centroids ----
    val cells = ivfIndex(vectors, cents2, idCol, vecCol)
    // queries probe their nProbe nearest cells
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cents2))
      .withColumn("s",
        graft.plans.CosineSimilarityExpr.cosine(col("q_vec"), col("ce")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("cid"), col("query_id"), col("q_vec"))
    val joined = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** Near-duplicate vector pairs: same `(table, bucket)` key in ANY table
    * AND cosine >= threshold. The composite equi-join keeps this linear-ish
    * in corpus size (bucket-local pairs only) instead of the quadratic
    * all-pairs join.
    *
    * Scale guards (both off by default so small-data results are exact):
    *  - `maxBucketSize > 0` drops (table,bucket) groups larger than the cap
    *    before the self-join — a degenerate bucket (e.g. a zero-vector
    *    cluster) otherwise contributes size^2/2 pairs on one join key;
    *  - the band shuffle is SLIM: only (id, t, bucket) flows through the
    *    exploded exchange, and the two 64-float payloads are re-joined by
    *    id after pair dedup — not carried nTables-wide through the shuffle.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double, nPlanes: Int,
      nTables: Int = 1, maxBucketSize: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Exchange barrier on the composite key: both self-join sides share
    // the subtree, so the bucket computation runs once (ReuseExchange) and
    // the join reads the shuffle output twice.
    val exploded = withTableBuckets(vectors, idCol, vecCol, "id", "vec",
      nPlanes, nTables)
      .select(col("id"), col("t"), col("bucket")) // slim: no vector payload
      .repartition(col("t"), col("bucket"))
    val b = Dedup.dropOversized(exploded, Seq("t", "bucket"), maxBucketSize)
    val l = b.select(col("t"), col("bucket"), col("id").as("a_id"))
    val r = b.select(col("t"), col("bucket"), col("id").as("b_id"))
    val pairs = l.hint("merge").join(r.hint("merge"), Seq("t", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val av = vectors.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val bv = vectors.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        cos6(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SEMANTIC DEDUP (SemDeDup shape — Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus into IVF cells, compute cosine
    * pairs ONLY WITHIN each cell, and drop every vector that is
    * semantically redundant with a lower-id cell-mate at `threshold`.
    * Near-dup LSH (q30) catches near-identical vectors; this catches
    * semantically redundant ones at a much lower threshold, because the
    * cell restriction keeps the pair space per-cell (sum of cellSize^2
    * over cells ≈ n^2/nCentroids), never the global n^2 — the published
    * SemDeDup cost model. Raising nCentroids at scale keeps cells
    * bounded; `maxCellSize` guards any degenerate cell exactly like the
    * LSH bucket caps.
    *
    * Returns verified pairs `(cid, a_id, b_id, cosine)`. House shuffle
    * discipline: the cell self-join carries slim (cid, id) rows only;
    * the 64-float payloads re-join by id afterwards.
    */
  def semanticDupPairs(vectors: DataFrame, threshold: Double,
      nCentroids: Int, trainIters: Int = 0, trainSample: Int = 256,
      maxCellSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    semanticDupPairsBarriered(vectors.repartition(col(idCol)), threshold,
      nCentroids, trainIters, trainSample, maxCellSize, idCol, vecCol)

  /** Body over an ALREADY-BARRIERED input. The public entry points
    * repartition `vectors` on the id first because this pipeline consumes
    * the input repeatedly (centroid seeds, cell assignment, both payload
    * re-joins, the survivor anti-join): every consumer re-derives an
    * unbarriered upstream — with an expensive one (a 20-way perturbed
    * union at the 20x stress corpus) that measured 69 s vs 5 s with the
    * single materialized exchange feeding all consumers via
    * ReuseExchange. Same lesson as q61/q68, join edition.
    */
  private def semanticDupPairsBarriered(v: DataFrame, threshold: Double,
      nCentroids: Int, trainIters: Int, trainSample: Int,
      maxCellSize: Int, idCol: String, vecCol: String): DataFrame = {
    val cents =
      ivfCentroids(v, nCentroids, trainIters, trainSample, idCol, vecCol)
    val slim = ivfIndex(v, cents, idCol, vecCol)
      .select(col("cid"), col("neighbor_id").as("id"))
      .repartition(col("cid"))
    val capped = Dedup.dropOversized(slim, Seq("cid"), maxCellSize)
    val l = capped.select(col("cid"), col("id").as("a_id"))
    val r = capped.select(col("cid"), col("id").as("b_id"))
    val pairs = l.hint("merge").join(r.hint("merge"), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
    val av = v.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val bv = v.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .select(col("cid"), col("a_id"), col("b_id"),
        cos6(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The pruning decision: keep every vector with no lower-id semantic
    * duplicate in its cell (min-id-wins greedy, the same survivorship
    * contract as q45's pair-level dedup).
    */
  def semanticSurvivors(vectors: DataFrame, threshold: Double,
      nCentroids: Int, trainIters: Int = 0, trainSample: Int = 256,
      maxCellSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = vectors.repartition(col(idCol))
    val drop = semanticDupPairsBarriered(v, threshold, nCentroids,
      trainIters, trainSample, maxCellSize, idCol, vecCol)
      .select(col("b_id").as(idCol)).distinct()
    v.join(drop, Seq(idCol), "left_anti")
  }

  /** kNN GRAPH: approximate top-k neighbors for EVERY vector — the
    * corpus-vs-corpus case where broadcasting a query set is impossible.
    * Candidates come from the multi-table (table,bucket) self-join (slim:
    * ids only through the exchange, payloads re-joined), then a per-id
    * top-k window. This is the primitive under semantic clustering /
    * connected-component dedup at corpus scale: cost is bucket-local
    * pairs, never the n^2 cross product, and the shuffle parallelism is
    * the nTables * 2^nPlanes composite key space.
    */
  def knnGraph(vectors: DataFrame, k: Int, nPlanes: Int, nTables: Int = 1,
      maxBucketSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val exploded = withTableBuckets(vectors, idCol, vecCol, "id", "vec",
      nPlanes, nTables)
      .select(col("id"), col("t"), col("bucket"))
      .repartition(col("t"), col("bucket"))
    val b = Dedup.dropOversized(exploded, Seq("t", "bucket"), maxBucketSize)
    val l = b.select(col("t"), col("bucket"), col("id").as("a_id"))
    val r = b.select(col("t"), col("bucket"), col("id").as("b_id"))
    // directed pairs (both orientations — each side ranks its own top-k)
    val pairs = l.hint("merge").join(r.hint("merge"), Seq("t", "bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val av = vectors.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val bv = vectors.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    val scored = pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .withColumn("cosine", cos6(col("a_vec"), col("b_vec")))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cosine").desc, col("b_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("a_id").as(idCol), col("rn"),
        col("b_id").as("neighbor_id"), col("cosine"))
  }

  /** ANN operating-point telemetry: per-table bucket occupancy and
    * candidate-pair volume for the (nPlanes, nTables, maxBucketSize)
    * geometry — the numbers that tell an operator whether the LSH
    * configuration fits the corpus BEFORE running the pair join. Returns
    * one row per table `(t, n_buckets, max_bucket, candidate_pairs,
    * dropped_buckets, dropped_rows)` and prints them in the
    * `METRIC graft.*` log-line convention (the reference's observability
    * surface, index.js:55-98).
    *
    * Cost: ONE pass over the slim (id, t, bucket) index + a per-(t,bucket)
    * count — candidate volume is computed as sum n*(n-1)/2 from the
    * counts, NOT by materializing the pair join. Safe to run on the full
    * 100 TB corpus as a planning probe.
    */
  def annTelemetry(vectors: DataFrame, nPlanes: Int, nTables: Int = 1,
      maxBucketSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val counts = withTableBuckets(vectors, idCol, vecCol, "id", "vec",
      nPlanes, nTables)
      .groupBy(col("t"), col("bucket")).count()
    val dropped = (c: Column) =>
      if (maxBucketSize > 0) c > maxBucketSize else lit(false)
    val perTable = counts.groupBy(col("t")).agg(
      count(lit(1)).as("n_buckets"),
      max(col("count")).as("max_bucket"),
      sum(when(dropped(col("count")), lit(0L))
        .otherwise(shiftright(col("count") * (col("count") - 1), 1)))
        .as("candidate_pairs"),
      sum(when(dropped(col("count")), lit(1L)).otherwise(lit(0L)))
        .as("dropped_buckets"),
      sum(when(dropped(col("count")), col("count")).otherwise(lit(0L)))
        .as("dropped_rows"))
      .orderBy(col("t"))
    // one pass: collect the (nTables)-row result, print, and return a
    // local-relation frame — callers consuming the return value must not
    // re-run the full corpus-index aggregation
    val rows = perTable.collect()
    rows.foreach { r =>
      println(s"METRIC graft.ann.table=${r.get(0)} " +
        s"graft.ann.n_buckets=${r.get(1)} " +
        s"graft.ann.max_bucket=${r.get(2)} " +
        s"graft.ann.candidate_pairs=${r.get(3)} " +
        s"graft.ann.dropped_buckets=${r.get(4)} " +
        s"graft.ann.dropped_rows=${r.get(5)}")
    }
    vectors.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), perTable.schema)
  }

  /** INCREMENTAL embedding near-dup: pairs touching a NEW vector batch —
    * new-vs-corpus plus new-vs-new — via the multi-table bucket index of
    * the combined set, instead of re-running the corpus self-join per
    * ingest (the vector analog of
    * [[graft.operators.Dedup.incrementalCandidatePairs]]; same combined-
    * bucket cap semantics, same (min,max) pair identity, ids must be
    * disjoint). Result == `nearDupPairs(corpus ∪ new)` restricted to
    * pairs with a member in `new` (SimilaritySpec).
    */
  def incrementalNearDupPairs(newVectors: DataFrame, corpus: DataFrame,
      threshold: Double, nPlanes: Int, nTables: Int = 1,
      maxBucketSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def slim(df: DataFrame, isNew: Boolean): DataFrame =
      withTableBuckets(df, idCol, vecCol, "id", "vec", nPlanes, nTables)
        .select(col("id"), col("t"), col("bucket"),
          lit(isNew).as("_new"))
    val all = slim(newVectors, isNew = true)
      .unionByName(slim(corpus, isNew = false))
      .repartition(col("t"), col("bucket"))
    val b = Dedup.dropOversized(all, Seq("t", "bucket"), maxBucketSize)
    val l = b.select(col("t"), col("bucket"), col("id").as("a_id"),
      col("_new").as("a_new"))
    val r = b.select(col("t"), col("bucket"), col("id").as("b_id"),
      col("_new").as("b_new"))
    val pairs = l.hint("merge").join(r.hint("merge"), Seq("t", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("a_new") || col("b_new"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val union = newVectors.unionByName(corpus)
    val av = union.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val bv = union.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        cos6(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The slim `(id, t, bucket)` rows of the multi-table sign-LSH index —
    * what a PERSISTENT vector candidate index stores per corpus member
    * (the vector analog of [[graft.operators.Dedup.bandIndexRows]]).
    */
  def bucketIndexRows(vectors: DataFrame, nPlanes: Int, nTables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    withTableBuckets(vectors, idCol, vecCol, "id", "vec", nPlanes, nTables)
      .select(col("id"), col("t"), col("bucket"))

  /** [[incrementalNearDupPairs]] against a PERSISTED corpus bucket index:
    * skips re-hashing the whole corpus (nTables x nPlanes x dim
    * multiplications per vector — the dominant per-batch cost) and joins
    * the batch's buckets against the stored slim rows; the cosine verify
    * reads corpus payloads only for touched candidate partners.
    * `corpusIndex` must equal `bucketIndexRows(corpus, nPlanes, nTables)`
    * (same geometry!) — SimilaritySpec asserts path equality under that
    * contract.
    */
  def incrementalNearDupPairsIndexed(newVectors: DataFrame,
      corpus: DataFrame, corpusIndex: DataFrame, threshold: Double,
      nPlanes: Int, nTables: Int = 1, maxBucketSize: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val newSlim =
      withTableBuckets(newVectors, idCol, vecCol, "id", "vec", nPlanes,
        nTables)
        .select(col("id"), col("t"), col("bucket"), lit(true).as("_new"))
    val all = newSlim
      .unionByName(corpusIndex.select(col("id"), col("t"), col("bucket"))
        .withColumn("_new", lit(false)))
      .repartition(col("t"), col("bucket"))
    val b = Dedup.dropOversized(all, Seq("t", "bucket"), maxBucketSize)
    val l = b.select(col("t"), col("bucket"), col("id").as("a_id"),
      col("_new").as("a_new"))
    val r = b.select(col("t"), col("bucket"), col("id").as("b_id"),
      col("_new").as("b_new"))
    val pairs = l.hint("merge").join(r.hint("merge"), Seq("t", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("a_new") || col("b_new"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
      .localCheckpoint() // EAGER: both consumers sit in ONE action — a lazy pin lets the two stages race-compute the same partitions
    val touched = pairs.select(col("a_id").as(idCol))
      .unionByName(pairs.select(col("b_id").as(idCol))).distinct()
    val payload = newVectors.unionByName(
      corpus.join(touched, Seq(idCol), "left_semi"))
    val av = payload.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val bv = payload.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    pairs.join(av, Seq("a_id")).join(bv, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        cos6(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------------------ IVF-PQ (ADC)

  /** Per-vector RESIDUAL against its assigned coarse centroid:
    * `(id, cid, residual: array<double>)`. The narrow assignment is the
    * codegen'd [[graft.plans.ArgmaxCosineExpr]]; the centroid frame is
    * broadcast (nCentroids rows).
    */
  def ivfResiduals(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val idx = ivfIndex(vectors, centroids, idCol, vecCol)
    idx.join(
      broadcast(centroids.select(col("cid").cast("int").as("cid"),
        col("ce"))), Seq("cid"))
      .select(col("neighbor_id").as(idCol), col("cid"),
        zip_with(transform(col("c_vec"), _.cast("double")), col("ce"),
          (a, b) => a - b).as("residual"))
  }

  /** PQ codebooks over residual space: deterministic data-point seeds (the
    * same convention as the IVF centroid seeds, so the DuckDB oracle can
    * reproduce every code) optionally refined by `trainIters` per-subspace
    * Lloyd iterations over the bounded `trainSample` residual sample.
    * Codebook m's seed entry k is subvector m of the residual of vector
    * `seedOffset + k`. Pass the coarse-quantizer's nCentroids as
    * `seedOffset`: vectors 0..nCentroids-1 ARE the centroid seeds, so
    * their residuals are exactly zero — sampling them would collapse the
    * codebook into identical zero entries. The collect is bounded by
    * max(codebookSize, trainSample) — driver state is small and the
    * result is broadcast back as a literal. The shipped q62 operating
    * point is trainIters=0 (oracle-reproducible data-point codebooks, the
    * IvfIters=0 precedent); training is the quality lever for corpora
    * with residual structure.
    */
  def pqCodebooks(vectors: DataFrame, centroids: DataFrame, nSub: Int,
      codebookSize: Int, seedOffset: Int = 0, trainIters: Int = 0,
      trainSample: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val sampleEnd = seedOffset + math.max(codebookSize, trainSample)
    val res = ivfResiduals(
      vectors.filter(col(idCol) >= seedOffset && col(idCol) < sampleEnd),
      centroids, idCol, vecCol)
      .select(col(idCol).cast("long"), col("residual"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    require(res.length >= codebookSize, "pqCodebooks: sample too small")
    val dim = res.head.length
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subvectors")
    val ds = dim / nSub
    val seeds = Array.tabulate(nSub)(m =>
      res.take(codebookSize).map(_.slice(m * ds, m * ds + ds)))
    if (trainIters == 0) return seeds
    // per-subspace Lloyd over the bounded residual sample — driver-side by
    // design (the sample IS driver-bounded, like ivfCentroids' per-
    // iteration means): assign first-wins to the L2-nearest entry,
    // recompute entry means in sample order, empty entries keep their
    // previous value. k-means error on the sample is monotonically
    // non-increasing (SimilaritySpec asserts it).
    val sample = Array.tabulate(nSub)(m =>
      res.map(_.slice(m * ds, m * ds + ds)))
    val cb = seeds.map(_.map(_.clone()))
    var it = 0
    while (it < trainIters) {
      var m = 0
      while (m < nSub) {
        val sums = Array.fill(codebookSize)(new Array[Double](ds))
        val counts = new Array[Int](codebookSize)
        sample(m).foreach { sv =>
          var bestD = Double.MaxValue; var bestK = -1; var k = 0
          while (k < codebookSize) {
            var d = 0.0; var i = 0
            while (i < ds) {
              val diff = sv(i) - cb(m)(k)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; bestK = k }
            k += 1
          }
          counts(bestK) += 1
          var i = 0
          while (i < ds) { sums(bestK)(i) += sv(i); i += 1 }
        }
        var k = 0
        while (k < codebookSize) {
          if (counts(k) > 0) {
            var i = 0
            while (i < ds) { cb(m)(k)(i) = sums(k)(i) / counts(k); i += 1 }
          }
          k += 1
        }
        m += 1
      }
      it += 1
    }
    cb
  }

  /** Encode a residual into its `nSub` PQ codes: per subvector, the index
    * of the L2-nearest codebook entry (first index wins ties — the same
    * rule as the oracle's `ORDER BY d, k`). Composed higher-order folds;
    * callers MUST materialize the residual behind an exchange first
    * ([[pqIndex]] does) or the residual tree is re-evaluated per
    * (subvector, codebook-entry).
    */
  def pqEncode(residual: Column, cb: Array[Array[Array[Double]]]): Column = {
    val nSub = cb.length
    val kk = cb(0).length
    val ds = cb(0)(0).length
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    transform(sequence(lit(0), lit(nSub - 1)), m => {
      val sub = slice(residual, m * ds + 1, lit(ds))
      val cbm = element_at(cbLit, m + 1)
      aggregate(sequence(lit(0), lit(kk - 1)),
        struct(lit(Double.MaxValue).as("best"), lit(-1).as("bk")),
        (acc, j) => {
          val entry = element_at(cbm, j + 1)
          val d = aggregate(sequence(lit(1), lit(ds)), lit(0.0),
            (s, i) => s + (element_at(sub, i) - element_at(entry, i)) *
              (element_at(sub, i) - element_at(entry, i)))
          when(d < acc.getField("best"),
            struct(d.as("best"), j.cast("int").as("bk"))).otherwise(acc)
        },
        acc => acc.getField("bk"))
    })
  }

  /** The PQ index: `(id, cid, codes)` — the relation a 100 TB ANN corpus
    * actually stores hot. 64 floats (256 B) per vector become nSub=8
    * 1-byte-range codes + a cell id; the raw vectors stay in cold storage
    * and are only re-joined for the final refine step of a query. The
    * `repartition(id)` is the materialization barrier that makes the
    * residual evaluate ONCE before the (nSub x codebookSize)-way encode
    * fold (same pattern as Dedup.signatures — measured >100x on composed
    * HOF pipelines without it).
    */
  def pqIndex(vectors: DataFrame, centroids: DataFrame,
      cb: Array[Array[Array[Double]]], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfResiduals(vectors, centroids, idCol, vecCol)
      .repartition(col(idCol))
      .select(col(idCol), col("cid"),
        graft.plans.PqEncodeExpr.encode(col("residual"), cb).as("codes"))

  /** Asymmetric-distance (ADC) approximate inner product of a query
    * against a PQ-coded vector: dot(q, centroid) is supplied by the caller
    * (per probed cell); this adds sum over subvectors of
    * dot(q_m, codebook[m][code_m]).
    */
  private def adcResidualDot(qVec: Column, codes: Column,
      cb: Array[Array[Array[Double]]]): Column = {
    val nSub = cb.length
    val ds = cb(0)(0).length
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    aggregate(sequence(lit(0), lit(nSub - 1)), lit(0.0), (s, m) => {
      val entry = element_at(element_at(cbLit, m + 1),
        element_at(codes, m + 1) + 1)
      s + aggregate(sequence(lit(1), lit(ds)), lit(0.0),
        (s2, i) => s2 + element_at(qVec, m * ds + i).cast("double") *
          element_at(entry, i))
    })
  }

  /** A trained IVF-PQ model — the FROZEN quantizer an incremental index
    * appends through: coarse centroids + per-subspace codebooks. PQ codes
    * are only comparable under the model that produced them, so the model
    * persists once ([[savePqModel]]) and every later batch — and every
    * query — loads the same one ([[loadPqModel]]); retraining means
    * reindexing. Driver-resident by design: nCentroids·dim +
    * nSub·codebookSize·(dim/nSub) doubles — KBs.
    */
  final case class PqModel(cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]]) {
    def centroidFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      cents.toSeq.map { case (c, e) => (c, e.toSeq) }.toDF("cid", "ce")
    }
  }

  /** Train the IVF coarse quantizer + PQ codebooks (the two Lloyd loops
    * [[knnIvfPq]] runs inline) and capture them as a reusable model.
    */
  def trainPqModel(vectors: DataFrame, nCentroids: Int = 16, nSub: Int = 8,
      codebookSize: Int = 16, trainIters: Int = 0, trainSample: Int = 256,
      pqTrainIters: Int = 0, pqTrainSample: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    val cents =
      ivfCentroids(vectors, nCentroids, trainIters, trainSample, idCol, vecCol)
    val cb = pqCodebooks(vectors, cents, nSub, codebookSize,
      seedOffset = nCentroids, trainIters = pqTrainIters,
      trainSample = pqTrainSample, idCol = idCol, vecCol = vecCol)
    val arr = cents.select(col("cid").cast("int"), col("ce"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    PqModel(arr, cb)
  }

  def savePqModel(spark: org.apache.spark.sql.SparkSession, model: PqModel,
      dir: String): Unit = {
    import spark.implicits._
    model.cents.toSeq.map { case (c, e) => (c, e.toSeq) }.toDF("cid", "ce")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    model.cb.zipWithIndex.flatMap { case (cbm, m) =>
      cbm.zipWithIndex.map { case (e, j) => (m, j, e.toSeq) } }.toSeq
      .toDF("m", "j", "entry")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): PqModel = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cb = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    PqModel(cents, cb)
  }

  /** [[pqIndex]] under a frozen model — the per-batch encode an
    * incremental index appends
    * ([[graft.streaming.StreamingIngest.indexVecBatch]]).
    */
  def pqIndexRows(vectors: DataFrame, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqIndex(vectors, model.centroidFrame(vectors.sparkSession), model.cb,
      idCol, vecCol)

  /** IVF-PQ ANN with exact refine: probe `nProbe` cells, score their
    * inverted lists by ADC approximate inner product over the CODES-ONLY
    * index (the memory-side half of the 100 TB ANN story — the scan never
    * touches raw vectors), keep `refineFactor * k` candidates per query,
    * then re-join exact vectors for those few and rank by exact cosine.
    *
    * Plan shape: index ⨝ broadcast(probes) on cid (the only big relation
    * is the slim code index), ADC as a row-local fold, one per-query
    * window over ~refineFactor*k*nProbe rows, then an id equi-join against
    * the vector table for the short refine list.
    */
  def knnIvfPq(vectors: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2, nSub: Int = 8,
      codebookSize: Int = 16, refineFactor: Int = 4, trainIters: Int = 0,
      trainSample: Int = 256, pqTrainIters: Int = 0,
      pqTrainSample: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // trainIters/trainSample drive the IVF coarse quantizer;
    // pqTrainIters/pqTrainSample drive the per-subspace PQ-codebook Lloyd
    // loop — two distinct training procedures, two knob pairs
    val model = trainPqModel(vectors, nCentroids, nSub, codebookSize,
      trainIters, trainSample, pqTrainIters, pqTrainSample, idCol, vecCol)
    knnIvfPqOnIndex(pqIndexRows(vectors, model, idCol, vecCol),
      vectors, queries, k, model, nProbe, refineFactor, idCol, vecCol)
  }

  /** [[knnIvfPq]]'s probe + ADC + refine over a PREBUILT `(id, cid,
    * codes)` index — the query side of the incremental-index story: the
    * index may have been appended batch-by-batch ([[indexVecBatch]]'s
    * output relation) and is never re-encoded per query batch.
    */
  def knnIvfPqOnIndex(pqCodes: DataFrame, vectors: DataFrame,
      queries: DataFrame, k: Int, model: PqModel, nProbe: Int = 2,
      refineFactor: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = model.centroidFrame(vectors.sparkSession)
    val cb = model.cb
    val index = pqCodes.withColumnRenamed(idCol, "neighbor_id")
    val dim = cb.length * cb(0)(0).length
    // queries probe their nProbe nearest cells, carrying dot(q, centroid)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cents.select(col("cid").cast("int").as("cid"),
        col("ce"))))
      .withColumn("s",
        graft.plans.CosineSimilarityExpr.cosine(col("q_vec"), col("ce")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .withColumn("dqc", aggregate(sequence(lit(1), lit(dim)), lit(0.0),
        (s, i) => s + element_at(col("q_vec"), i).cast("double") *
          element_at(col("ce"), i)))
      .select(col("cid"), col("query_id"), col("q_vec"), col("dqc"))
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        col("dqc") + adcResidualDot(col("q_vec"), col("codes"), cb))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cand = scored.withColumn("arn", row_number().over(wr))
      .filter(col("arn") <= refineFactor * k)
      .select(col("query_id"), col("neighbor_id"), col("q_vec"))
    // exact refine over the short list only
    val exact = cand.join(
      vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      Seq("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(exact, k)
  }

  // ------------------------------------------- index health / rebalance

  /** IVF cell-occupancy telemetry over a `(id, cid, ...)` index relation
    * — the health probe an operator runs BEFORE queries degrade: a
    * frozen-model incremental index ([[pqIndexRows]] appends) silently
    * concentrates drifted streams into a few hot cells, and a hot cell
    * is both a recall cliff (probing it returns a huge unranked list)
    * and a scan hotspot (one cid join key carries the cell's whole
    * inverted list through one task). ONE slim groupBy over the index —
    * never touches vectors — returning `(cid, n)` per cell plus METRIC
    * lines (cells, rows, max/mean occupancy, hottest cell), the
    * [[annTelemetry]] convention. Safe as a 100 TB planning probe: the
    * collect is bounded by the number of cells.
    */
  def ivfTelemetry(index: DataFrame, cidCol: String = "cid"): DataFrame = {
    val perCell = index.groupBy(col(cidCol).cast("int").as("cid"))
      .agg(count(lit(1)).as("n")).orderBy(col("cid"))
    val rows = perCell.collect() // bounded: one row per cell
    val total = rows.map(_.getLong(1)).sum
    val maxRow = if (rows.isEmpty) null
      else rows.maxBy(r => (r.getLong(1), -r.getInt(0)))
    println(s"METRIC graft.ivf.cells=${rows.length} " +
      s"graft.ivf.rows=$total " +
      s"graft.ivf.max_cell=${if (maxRow == null) 0 else maxRow.getLong(1)} " +
      s"graft.ivf.hot_cid=${if (maxRow == null) -1 else maxRow.getInt(0)} " +
      s"graft.ivf.mean_cell=${if (rows.isEmpty) 0.0
        else total.toDouble / rows.length}")
    index.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), perCell.schema)
  }

  /** Outcome of [[rebalanceIvfPq]]: the updated (still frozen-codebook)
    * model, the rewritten `(id, cid, codes)` index, and which cells were
    * split (empty = the index was already balanced and both `model` and
    * `index` are the inputs, untouched).
    */
  final case class RebalanceResult(model: PqModel, index: DataFrame,
      splitCells: Seq[Int])

  /** Split-and-re-encode the OVERSIZED cells of an incremental IVF-PQ
    * index — the maintenance op that keeps a frozen coarse quantizer
    * healthy under distribution drift without the reindex-the-world cost
    * of full retraining. Cells with occupancy > `maxCellSize` are each
    * split into `ceil(2n/maxCellSize)` subcells by a deterministic
    * driver-side Lloyd refinement over a bounded member sample (first
    * `sampleSize` ids; seeds = first k member vectors; cosine
    * assignment, ties to the lowest subcell, id-ordered mean folds —
    * the [[ivfCentroids]] conventions cell-locally). Subcell 0 replaces
    * the hot centroid in place; the rest take fresh cids past the
    * current max, so every UNAFFECTED cell keeps its cid, its centroid,
    * and therefore its committed codes — only members of hot cells are
    * re-encoded ([[pqIndexRows]] under the updated model, global argmax,
    * so a drifted vector may legitimately migrate to a neighboring
    * cold cell). PQ codebooks are NOT retrained: they are global
    * per-subspace tables, so codes stay comparable across old and new
    * cells and the ADC scorer needs no versioning.
    *
    * Scale shape: one bounded occupancy agg + one bounded sample
    * collect + one semi-join to pull hot members + the re-encode
    * projection over ONLY those members; the untouched majority of the
    * index is passed through without shuffle. Cost tracks the hot
    * cells, not the corpus.
    *
    * Invariant (SimilaritySpec): rows for affected members equal
    * `pqIndexRows(affectedVectors, newModel)` exactly — a full rebuild
    * under the new model restricted to those vectors — and unaffected
    * rows are byte-identical to the input index.
    */
  def rebalanceIvfPq(pqCodes: DataFrame, vectors: DataFrame,
      model: PqModel, maxCellSize: Int, lloydIters: Int = 2,
      sampleSize: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding"): RebalanceResult = {
    require(maxCellSize > 0, "maxCellSize must be positive")
    val occ = pqCodes.groupBy(col("cid").cast("int").as("cid"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val hot = occ.filter(_._2 > maxCellSize).map(_._1)
    if (hot.isEmpty) return RebalanceResult(model, pqCodes, Nil)
    hot.foreach { c =>
      println(s"METRIC graft.ivf.rebalance_cell=$c " +
        s"n=${occ.find(_._1 == c).get._2} max=$maxCellSize")
    }
    // bounded per-cell member sample in deterministic HASH order — not
    // smallest-ids-first, which under a drifted stream (new ids are the
    // large ones) would sample only pre-drift members and train subcell
    // centroids blind to the very blob that made the cell hot
    val wc = Window.partitionBy(col("cid"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    val sample = pqCodes.filter(col("cid").isin(hot.map(Int.box): _*))
      .select(col("cid").cast("int").as("cid"), col(idCol))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= sampleSize)
      .join(vectors.select(col(idCol),
        transform(col(vecCol), _.cast("double")).as("v")), Seq(idCol))
      .select(col("cid"), col("rn"), col("v"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).map { case (c, rs) =>
        // hash order (rn), NOT id order: seeds drawn from the front must
        // reflect the cell's current mixture, drift included
        c -> rs.sortBy(_._2).map(_._3) }
    var nextCid = occ.map(_._1).max.max(model.cents.map(_._1).max) + 1
    val replaced = scala.collection.mutable.Map.empty[Int, Array[Double]]
    val added = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Double])]
    val oldCentOf = model.cents.toMap
    hot.foreach { c =>
      val n = occ.find(_._1 == c).get._2
      // aim at third-of-cap subcells: splits of weakly-clustered cells
      // come out unbalanced, so half-cap targets leave no headroom and
      // the biggest subcell can land back at the cap
      val k0 = math.max(2, math.ceil(3.0 * n / maxCellSize).toInt)
      val oldC = oldCentOf(c)
      // cluster RESIDUALS (member − old centroid) by L2, not raw
      // vectors by cosine: a hot cell is hot precisely because its
      // members share a strong common direction (a drift blob, template
      // boilerplate, a magnitude pile-up), and against near-parallel
      // members cosine k-means collapses winner-take-all — the dominant
      // subcell's mean best estimates the shared direction and
      // re-captures everything. The residuals are exactly the structure
      // that DISTINGUISHES members, so clustering them splits the cell
      // where raw-vector clustering cannot; subcell centroid =
      // old centroid + residual-cluster mean.
      val members = sample(c).map { v =>
        Array.tabulate(v.length)(i => v(i) - oldC(i)) }
      val k = math.min(members.length, k0)
      var cents = members.take(k).map(_.clone())
      var it = 0
      while (it < lloydIters) {
        val dim = cents(0).length
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        members.foreach { v =>
          var bestD = Double.MaxValue; var bestK = 0; var j = 0
          while (j < k) {
            var d = 0.0; var i = 0
            while (i < dim) {
              val t = v(i) - cents(j)(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; bestK = j } // ties: lowest j wins
            j += 1
          }
          counts(bestK) += 1
          var i = 0
          while (i < dim) { sums(bestK)(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(k) { j =>
          if (counts(j) > 0)
            Array.tabulate(dim)(i => sums(j)(i) / counts(j))
          else cents(j)
        }
        it += 1
      }
      val full = cents.map(r => Array.tabulate(r.length)(i => oldC(i) + r(i)))
      replaced(c) = full(0)
      (1 until k).foreach { j =>
        added += nextCid -> full(j); nextCid += 1
      }
    }
    val newCents = (model.cents.map { case (c, e) =>
      c -> replaced.getOrElse(c, e) } ++ added).sortBy(_._1)
    val newModel = PqModel(newCents, model.cb)
    val affectedIds = pqCodes
      .filter(col("cid").isin(hot.map(Int.box): _*))
      .select(col(idCol))
    val affVecs = vectors.join(affectedIds, Seq(idCol), "left_semi")
    val reencoded = pqIndexRows(affVecs, newModel, idCol, vecCol)
    val untouched =
      pqCodes.filter(!col("cid").isin(hot.map(Int.box): _*))
    RebalanceResult(newModel,
      untouched.unionByName(reencoded), hot.toSeq)
  }

}
