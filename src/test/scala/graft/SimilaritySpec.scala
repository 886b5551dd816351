package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private val vectors = Seq(
    (0L, vec(1, 0, 0, 0)), (1L, vec(0.9, 0.1, 0, 0)),
    (2L, vec(0, 1, 0, 0)), (3L, vec(-1, 0, 0, 0)),
    (4L, vec(0.95, 0.05, 0, 0))
  ).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val row = Seq((vec(1, 2, 3, 0), vec(1, 2, 3, 0), vec(-1, -2, -3, 0),
      vec(3, -1.5, 0, 0)))
      .toDF("a", "b", "neg", "orth")
      .select(
        round(VectorOps.cosine(col("a"), col("b")), 9).as("same"),
        round(VectorOps.cosine(col("a"), col("neg")), 9).as("opp"),
        round(VectorOps.cosine(col("a"), col("orth")), 9).as("orth"))
      .head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == -1.0)
    assert(row.getDouble(2) == 0.0)
  }

  test("brute-force knn ranks by cosine desc with id tiebreak, excludes self") {
    val out = Similarity.knnBruteForce(
      vectors, vectors.filter(col("vec_id") === 0), k = 3)
      .select("rn", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(4L, 1L, 2L)) // by cosine to (1,0,0,0)
    // INT vec ids widen to long (regression: the TopKAgg ranking must
    // not narrow the id types the window form handled)
    val intVecs = vectors.withColumn("vec_id", col("vec_id").cast("int"))
    val outInt = Similarity.knnBruteForce(
      intVecs, intVecs.filter(col("vec_id") === 0), k = 3)
      .select("rn", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(outInt.map(_._2).toSeq == Seq(4L, 1L, 2L))
  }

  test("near-dup pairs finds the close cluster only") {
    // 64-dim vectors for the deterministic planes
    val dim = 64
    def unit(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    }
    val base = unit(7)
    val nearCopy = base.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.01f else x }
    val vecs = Seq((0L, base), (1L, nearCopy), (2L, unit(8)), (3L, unit(9)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, threshold = 0.99, nPlanes = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("native HyperplaneBucketsExpr == composed hyperplaneBucket fold " +
      "(single table), and multi-table slices use consecutive plane blocks") {
    val dim = 64
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 100L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // table 0 of an L-table expr == the single-table expr == the composed
    // higher-order-function fold over deterministicPlanes
    val planes8 = VectorOps.deterministicPlanes(8, dim)
    val rows = vecs.select(
      VectorOps.hyperplaneBucket(col("embedding"), planes8).as("composed"),
      graft.plans.HyperplaneBucketsExpr.bucket(col("embedding"), 8)
        .as("native1"),
      graft.plans.HyperplaneBucketsExpr.buckets(col("embedding"), 8, 3)
        .as("nativeL"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getSeq[Long](2).head == r.getLong(0))
      assert(r.getSeq[Long](2).length == 3)
    }
    // table 1 must equal a single-table run over planes 8..15: check via
    // the composed fold with plane offset — planes for global index p use
    // (p*dim + d), so table 1's planes are deterministicPlanes(16,dim).drop(8)
    val planes16 = VectorOps.deterministicPlanes(16, dim).drop(8)
    val r2 = vecs.select(
      VectorOps.hyperplaneBucket(col("embedding"), planes16).as("composed"),
      element_at(graft.plans.HyperplaneBucketsExpr
        .buckets(col("embedding"), 8, 2), 2).as("native"))
      .collect()
    r2.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("multi-table nearDupPairs with cap + payload re-join finds the " +
      "close cluster; candidate union over tables is deduped") {
    val dim = 64
    def unit(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    }
    val base = unit(7)
    val nearCopy = base.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.01f else x }
    val vecs = Seq((0L, base), (1L, nearCopy), (2L, unit(8)), (3L, unit(9)))
      .toDF("vec_id", "embedding")
    // a near-identical pair agrees in EVERY table — result must still be
    // the single deduped pair, and the cap (well above bucket sizes) must
    // not drop it
    val pairs = Similarity.nearDupPairs(vecs, threshold = 0.99,
      nPlanes = 4, nTables = 4, maxBucketSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((0L, 1L)))
    // cap = 1 drops every 2+ bucket — the pair must vanish, not error
    val capped = Similarity.nearDupPairs(vecs, threshold = 0.99,
      nPlanes = 1, nTables = 1, maxBucketSize = 1)
      .count()
    assert(capped == 0)
  }

  test("IVF Lloyd training improves probe recall on CLUSTERED data " +
      "(the case the trained quantizer exists for)") {
    val dim = 64
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    // ids 0..19 cluster 0, 20..39 cluster 1, 40..59 cluster 2 — so the
    // first-4-vectors seed is blind to clusters 1 and 2
    val vecs = (0L until 60L).map { i =>
      val c = centers((i / 20).toInt)
      (i, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id").isin(5L, 25L, 45L))
    def recall(trainIters: Int): Int = {
      val got = Similarity.knnIvf(vecs, queries, k = 5, nCentroids = 4,
        nProbe = 1, trainIters = trainIters, trainSample = 60)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = Similarity.knnBruteForce(vecs, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      want.map { case (q, w) =>
        got.get(q).map(g => (g & w).size).getOrElse(0) }.sum
    }
    // the all-cluster-0 seed crams clusters 1 and 2 into foreign cells:
    // recall survives (their vectors land TOGETHER), but the probed
    // inverted lists are bloated — the per-query scan cost at scale.
    // Training must even out the lists without giving up recall.
    def maxCell(trainIters: Int): Long =
      Similarity.ivfIndex(vecs,
        Similarity.ivfCentroids(vecs, nCentroids = 4,
          trainIters = trainIters, trainSample = 60))
        .groupBy("cid").count().agg(max("count")).as[Long].head()
    val (untrainedMax, trainedMax) = (maxCell(0), maxCell(2))
    assert(trainedMax < untrainedMax,
      s"training should balance inverted lists: max cell " +
        s"$untrainedMax -> $trainedMax")
    assert(recall(2) >= recall(0),
      "training must not cost recall on clustered data")
    assert(recall(2) >= 12) // >= 80% of 15
  }

  test("semantic dedup on a clustered fixture: within-cell redundant " +
      "members pruned, min id survives, cross-cluster pairs untouched") {
    val dim = 64
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    def jitter(b: Array[Double]) =
      b.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
    // seeds 0..2 = the three cluster bases, 3 = an isolated random vector;
    // 4,5 redundant with base 0; 6,7 with base 1; 8 with base 2;
    // 9 = another isolated vector
    val vecs = (Seq(
      0L -> bases(0).map(_.toFloat), 1L -> bases(1).map(_.toFloat),
      2L -> bases(2).map(_.toFloat),
      3L -> Array.fill(dim)(rnd.nextGaussian().toFloat)) ++ Seq(
      4L -> jitter(bases(0)), 5L -> jitter(bases(0)),
      6L -> jitter(bases(1)), 7L -> jitter(bases(1)),
      8L -> jitter(bases(2)),
      9L -> Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDupPairs(vecs, threshold = 0.9,
      nCentroids = 4, trainIters = 0, trainSample = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 4L), (0L, 5L), (4L, 5L), (1L, 6L), (1L, 7L),
      (6L, 7L), (2L, 8L)), s"got $pairs")
    val kept = Similarity.semanticSurvivors(vecs, threshold = 0.9,
      nCentroids = 4, trainIters = 0, trainSample = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 9L))
    // cell cap: capping below the biggest cell size suppresses its pairs
    val capped = Similarity.semanticDupPairs(vecs, threshold = 0.9,
      nCentroids = 4, trainIters = 0, trainSample = 10, maxCellSize = 2)
      .count()
    assert(capped < pairs.size)
  }

  test("argmax-cosine: NaN (zero-norm side) sorts FIRST like ORDER BY " +
      "DESC in both engines, smallest cid wins among NaNs") {
    import graft.plans.ArgmaxCosineExpr
    val cids = Array(0, 1)
    // centroid 0 is zero-norm -> cosine NaN against every vector: the
    // (cosine DESC, cid) contract assigns EVERYTHING to it
    val degenerate = Array(Array.fill(4)(0.0), Array(1.0, 0.0, 0.0, 0.0))
    val vecs = Seq((7L, Array(1f, 0f, 0f, 0f)), (8L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = vecs.select(
      ArgmaxCosineExpr.assign(col("embedding"), cids, degenerate).as("cid"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0))
    // zero-norm VECTOR against healthy centroids: all scores NaN ->
    // smallest cid
    val healthy = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val zv = Seq((9L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    assert(zv.select(ArgmaxCosineExpr.assign(col("embedding"), cids, healthy)
      .as("cid")).as[Int].head() == 0)
  }

  test("IVF-PQ: codes-only ADC + exact refine loses little recall vs " +
      "IVF-flat on clustered data") {
    val dim = 64
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 60L).map { i =>
      val c = centers((i / 20).toInt)
      (i, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id").isin(5L, 25L, 45L))
    def recallOf(got: org.apache.spark.sql.DataFrame): Int = {
      val g = got.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = Similarity.knnBruteForce(vecs, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      want.map { case (q, w) =>
        g.get(q).map(x => (x & w).size).getOrElse(0) }.sum
    }
    val flat = recallOf(Similarity.knnIvf(vecs, queries, k = 5,
      nCentroids = 4, nProbe = 2, trainIters = 0, trainSample = 60))
    val pq = recallOf(Similarity.knnIvfPq(vecs, queries, k = 5,
      nCentroids = 4, nProbe = 2, nSub = 8, codebookSize = 12,
      refineFactor = 4, trainIters = 0, trainSample = 60))
    assert(pq >= flat - 2,
      s"IVF-PQ recall $pq fell too far below IVF-flat $flat")
    assert(pq >= 10) // >= 2/3 of 15 in absolute terms
  }

  test("PQ codes: deterministic, bounded range, exact-zero residual for " +
      "codebook seeds against their own entry") {
    val dim = 64
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 30L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, nCentroids = 4,
      trainIters = 0, trainSample = 30)
    // codebook sample starts PAST the centroid seeds (ids 0..3 have
    // exactly-zero residuals — sampling them would collapse the codebook)
    val cb = Similarity.pqCodebooks(vecs, cents, nSub = 8, codebookSize = 8,
      seedOffset = 4)
    assert(cb.length == 8 && cb(0).length == 8 && cb(0)(0).length == 8)
    val idx = Similarity.pqIndex(vecs, cents, cb)
    val codes = idx.select("vec_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 30)
    assert(codes.values.forall(cs =>
      cs.length == 8 && cs.forall(c => c >= 0 && c < 8)))
    // a codebook seed's residual IS entry k in every subspace — its code
    // must be itself (distance exactly 0, no closer entry exists)
    (0 until 8).foreach(j =>
      assert(codes(4L + j) == Seq.fill(8)(j), s"seed ${4 + j}"))
    // deterministic across recomputation
    val again = Similarity.pqIndex(vecs, cents, cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(again == codes)
    // native codegen encoder == composed fold (same tie rule)
    val composed = Similarity.ivfResiduals(vecs, cents)
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        Similarity.pqEncode(col("residual"), cb).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(composed == codes)
  }

  test("annTelemetry: per-table occupancy and candidate volume match the " +
      "pair join it predicts, caps zero out oversized buckets") {
    val dim = 64
    val rnd = new scala.util.Random(2)
    val vecs = (0L until 12L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val t = Similarity.annTelemetry(vecs, nPlanes = 1, nTables = 1)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(t.length == 1)
    val (_, nBuckets, maxBucket, candPairs, dropB, dropR) = t.head
    assert(nBuckets >= 1 && nBuckets <= 2)     // 1-bit LSH: two buckets
    assert(maxBucket <= 12 && dropB == 0 && dropR == 0)
    // the predicted candidate volume IS the pair-join size at nTables=1
    val actualPairs = Similarity.nearDupPairs(vecs, threshold = -1.0,
      nPlanes = 1, nTables = 1).count()
    assert(candPairs == actualPairs)
    // cap=1: every multi-occupant bucket is dropped — zero candidates,
    // dropped counters carry what was excluded
    val capped = Similarity.annTelemetry(vecs, nPlanes = 1, nTables = 1,
      maxBucketSize = 1)
      .as[(Int, Long, Long, Long, Long, Long)].collect().head
    assert(capped._4 == 0)
    assert(capped._5 >= 1 && capped._6 >= capped._5)
  }

  test("trained PQ codebooks: per-subspace Lloyd reduces sample " +
      "quantization error (k-means monotonicity)") {
    val dim = 64
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 60L).map { i =>
      val c = centers((i / 20).toInt)
      (i, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, nCentroids = 4,
      trainIters = 0, trainSample = 60)
    val sample = Similarity.ivfResiduals(
      vecs.filter(col("vec_id") >= 4 && col("vec_id") < 60), cents)
      .select(col("vec_id"), col("residual"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    def errOf(cb: Array[Array[Array[Double]]]): Double = {
      val ds = dim / cb.length
      sample.map { r =>
        cb.indices.map { m =>
          cb(m).map { e =>
            (0 until ds).map { i =>
              val d = r(m * ds + i) - e(i); d * d }.sum
          }.min
        }.sum
      }.sum
    }
    val cb0 = Similarity.pqCodebooks(vecs, cents, nSub = 8,
      codebookSize = 8, seedOffset = 4, trainIters = 0, trainSample = 56)
    val cb2 = Similarity.pqCodebooks(vecs, cents, nSub = 8,
      codebookSize = 8, seedOffset = 4, trainIters = 2, trainSample = 56)
    assert(errOf(cb2) <= errOf(cb0))
    assert(errOf(cb2) < errOf(cb0) * 0.99,
      "Lloyd from data-point seeds should strictly improve on this fixture")
    // trained codebooks still drive a working index (codes in range)
    val idx = Similarity.pqIndex(vecs, cents, cb2)
      .select("codes").as[Seq[Int]].collect()
    assert(idx.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 8)))
  }

  test("incremental near-dup == full recompute restricted to the batch") {
    val dim = 64
    val rnd = new scala.util.Random(3)
    def jitter(base: Array[Float]): Array[Float] =
      base.zipWithIndex.map { case (x, i) =>
        if (i < 2) x + 0.01f else x }
    val bases = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // corpus ids 0-5; batch ids 10-12 where 10 is a near-dup of corpus 0
    // and 11/12 are near-dups of each other
    val corpus = (0L until 6L).map(i => (i, bases(i.toInt)))
      .toDF("vec_id", "embedding")
    val extra = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val batch = Seq((10L, jitter(bases(0))), (11L, extra),
      (12L, jitter(extra))).toDF("vec_id", "embedding")
    val full = Similarity.nearDupPairs(corpus.unionByName(batch), 0.99,
      nPlanes = 4, nTables = 3, maxBucketSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val newIds = Set(10L, 11L, 12L)
    val inc = Similarity.incrementalNearDupPairs(batch, corpus, 0.99,
      nPlanes = 4, nTables = 3, maxBucketSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(inc == full.filter(p => newIds(p._1) || newIds(p._2)))
    assert(inc.contains((0L, 10L)) && inc.contains((11L, 12L)))
    // PERSISTED-INDEX form agrees under its contract (same geometry),
    // including cosines; orphan index rows (crash window) change nothing
    val idx = Similarity.bucketIndexRows(corpus, nPlanes = 4, nTables = 3)
    val got = Similarity.incrementalNearDupPairsIndexed(batch, corpus, idx,
      0.99, nPlanes = 4, nTables = 3, maxBucketSize = 100)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    val want = Similarity.incrementalNearDupPairs(batch, corpus, 0.99,
      nPlanes = 4, nTables = 3, maxBucketSize = 100)
      .select(col("a_id"), col("b_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    val withOrphans = idx.unionByName(
      Similarity.bucketIndexRows(batch, nPlanes = 4, nTables = 3))
    val got2 = Similarity.incrementalNearDupPairsIndexed(batch, corpus,
      withOrphans, 0.99, nPlanes = 4, nTables = 3, maxBucketSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got2 == inc)
  }

  test("ivfTelemetry: per-cell occupancy matches a direct groupBy") {
    val dim = 64
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val model = Similarity.trainPqModel(vecs, nCentroids = 4, nSub = 8,
      codebookSize = 8)
    val idx = Similarity.pqIndexRows(vecs, model)
    val got = Similarity.ivfTelemetry(idx)
      .as[(Int, Long)].collect().toMap
    val want = idx.groupBy("cid").count()
      .as[(Int, Long)].collect().toMap
    assert(got == want)
    assert(got.values.sum == 40L)
  }

  test("rebalanceIvfPq: splits only hot cells; unaffected rows are " +
      "byte-identical; re-encoded rows equal a full rebuild under the " +
      "new model; occupancy drops; balanced index is a no-op") {
    val dim = 64
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    def near(c: Array[Double]): Array[Float] =
      c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
    // base: 3 clusters x 20, interleaved so the first-nCentroids seed
    // vectors (ids 0,1,2) land one per cluster; the frozen model trains
    // on this snapshot
    val base = (0L until 60L).map(i => (i, near(centers((i % 3).toInt))))
      .toDF("vec_id", "embedding")
    val model = Similarity.trainPqModel(base, nCentroids = 3, nSub = 8,
      codebookSize = 12)
    val idx0 = Similarity.pqIndexRows(base, model)
    // drifted stream: 60 more vectors all near centers(0) appended
    // incrementally under the frozen model -> one cell runs hot
    val drift = (100L until 160L).map(i => (i, near(centers(0))))
      .toDF("vec_id", "embedding")
    val all = base.unionByName(drift)
    val idx = idx0.unionByName(Similarity.pqIndexRows(drift, model))
      .localCheckpoint()
    val occBefore = idx.groupBy("cid").count().as[(Int, Long)]
      .collect().toMap
    val maxBefore = occBefore.values.max
    assert(maxBefore > 40, s"fixture must have a hot cell, got $occBefore")

    val res = Similarity.rebalanceIvfPq(idx, all, model, maxCellSize = 40)
    assert(res.splitCells.nonEmpty)
    assert(res.splitCells.toSet ==
      occBefore.filter(_._2 > 40).keySet) // exactly the oversized cells
    // row count preserved: every vector still indexed exactly once
    assert(res.index.count() == idx.count())
    val hotIds = idx
      .filter(col("cid").isin(res.splitCells.map(Int.box): _*))
      .select("vec_id").as[Long].collect().toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid", "codes").as[(Long, Int, Seq[Int])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val before = rows(idx)
    val after = rows(res.index)
    // unaffected members: byte-identical rows (cid AND codes)
    before.keys.filterNot(hotIds).foreach { id =>
      assert(after(id) == before(id), s"unaffected row $id changed")
    }
    // affected members: exactly a full rebuild under the new model
    val rebuilt = rows(Similarity.pqIndexRows(
      all.filter(col("vec_id").isin(hotIds.toSeq.map(Long.box): _*)),
      res.model))
    hotIds.foreach { id =>
      assert(after(id) == rebuilt(id), s"re-encoded row $id != rebuild")
    }
    // the hot cell was actually dissipated
    val occAfter = res.index.groupBy("cid").count().as[(Int, Long)]
      .collect().toMap
    assert(occAfter.values.max < maxBefore,
      s"max occupancy did not drop: $occBefore -> $occAfter")
    // untouched centroids byte-identical in the new model
    val oldCents = model.cents.toMap
    res.model.cents.toMap.foreach { case (c, e) =>
      if (!res.splitCells.contains(c) && oldCents.contains(c))
        assert(e.sameElements(oldCents(c)), s"cold centroid $c moved")
    }
    // queries still answer under the rebalanced (model, index) pair,
    // refine step exact: top-1 for a drifted query is a true neighbor
    val q = all.filter(col("vec_id") === 150L)
    val knn = Similarity.knnIvfPqOnIndex(res.index, all, q, k = 3,
      res.model, nProbe = 2)
    val got = knn.select("rn", "neighbor_id", "cosine")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 3)
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    // balanced index: strict no-op (same objects back)
    val noop = Similarity.rebalanceIvfPq(idx, all, model,
      maxCellSize = 10000)
    assert(noop.splitCells.isEmpty)
    assert(noop.model eq model)
    assert(noop.index eq idx)
  }

  test("lsh knn only ranks bucket-mates (subset of brute-force candidates)") {
    val dim = 64
    val rnd = new scala.util.Random(1)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    val lsh = Similarity.knnLsh(vecs, q, k = 5, nPlanes = 2)
      .select("neighbor_id").as[Long].collect().toSet
    val brute = Similarity.knnBruteForce(vecs, q, k = 49)
      .select("neighbor_id").as[Long].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }
}
