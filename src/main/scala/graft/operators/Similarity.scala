package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

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

  private def ranked(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
  }

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

  /** Approximate top-k: only candidates in the query's hyperplane bucket
    * are ranked. `nPlanes` controls bucket granularity (2^nPlanes buckets).
    */
  def knnLsh(vectors: DataFrame, queries: DataFrame, k: Int, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = 64
    val planes = VectorOps.deterministicPlanes(nPlanes, dim)
    def withBucket(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        VectorOps.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val q = withBucket(queries, "query_id", "q_vec")
    val c = withBucket(vectors, "neighbor_id", "c_vec")
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** Multiprobe ANN: like [[knnLsh]] but each query also probes the
    * nPlanes buckets at Hamming distance 1 from its own (flip one
    * hyperplane sign) — the standard recall fix for sign-LSH without
    * building more hash tables. Candidates grow ~(nPlanes+1)x per query;
    * the corpus side is still bucket-partitioned, queries broadcast.
    */
  def knnLshMultiprobe(vectors: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = 64
    val planes = VectorOps.deterministicPlanes(nPlanes, dim)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      VectorOps.hyperplaneBucket(col(vecCol), planes).as("qbucket"))
      .withColumn("bucket", explode(array(
        col("qbucket") +: (0 until nPlanes).map(p =>
          col("qbucket").bitwiseXOR(lit(1L << p))): _*)))
    val c = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      VectorOps.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `nCentroids` vectors serve as centroids), every vector assigned to
    * its max-cosine cell (the inverted lists), and each query probing its
    * `nProbe` nearest cells. All relational: one broadcast cross-join
    * against the tiny centroid set for assignment, then an equi-join on
    * cell id — candidate generation never forms the full cross product,
    * and the cell assignment is computed once and reusable as a
    * materialized index table at scale.
    */
  def knnIvf(vectors: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = vectors.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("ce"))
    def scoreCells(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .crossJoin(broadcast(cents))
        .withColumn("s",
          graft.plans.CosineSimilarityExpr.cosine(col(vec), col("ce")))
    // inverted lists: each vector in exactly one cell (raw-cosine argmax,
    // centroid id tiebreak)
    val wv = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("s").desc, col("cid"))
    val cells = scoreCells(vectors, "neighbor_id", "c_vec")
      .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
      .select(col("cid"), col("neighbor_id"), col("c_vec"))
    // queries probe their nProbe nearest cells
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = scoreCells(queries, "query_id", "q_vec")
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("cid"), col("query_id"), col("q_vec"))
    val joined = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cos6(col("q_vec"), col("c_vec")))
    ranked(joined, k)
  }

  /** Near-duplicate vector pairs: same LSH bucket AND cosine >= threshold.
    * The bucket equi-join keeps this linear-ish in corpus size (bucket-
    * local pairs only) instead of the quadratic all-pairs join.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = 64
    val planes = VectorOps.deterministicPlanes(nPlanes, dim)
    // Exchange barrier on the bucket: both self-join sides share the
    // subtree, so the bucket computation runs once (ReuseExchange) and the
    // join reads the shuffle output twice.
    val b = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      VectorOps.hyperplaneBucket(col(vecCol), planes).as("bucket"))
      .repartition(col("bucket"))
    val l = b.select(col("bucket"), col("id").as("a_id"),
      col("vec").as("a_vec"))
    val r = b.select(col("bucket"), col("id").as("b_id"),
      col("vec").as("b_vec"))
    l.hint("merge").join(r.hint("merge"), Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cos6(col("a_vec"), col("b_vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
