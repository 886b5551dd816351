package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-wide heavy-hitter tokens by the two-pass sketch-then-confirm
  * pattern: a bounded Misra–Gries summary per partition nominates
  * candidates (provably a superset of every token above the frequency
  * threshold), then one exact counting pass confirms — so the OUTPUT is
  * exact and deterministic even though the sketch pass is
  * partitioning-dependent.
  *
  * Scale posture (the reason this isn't a plain `GROUP BY token`): the
  * naive exact count shuffles the ENTIRE vocabulary — at web scale that
  * is billions of distinct tokens of mostly-useless tail. Here the only
  * full-vocabulary structure ever built is the per-partition in-memory
  * summary of k counters (k = ceil(2/minFrac), independent of corpus
  * size); the confirm pass semi-joins against the ≤ k·numPartitions
  * candidate tokens (broadcast), so the exact `GROUP BY` shuffles at
  * most numPartitions·|candidates| partially-aggregated rows. Three
  * linear scans, no wide shuffle, mergeable by construction.
  */
object HeavyHitters {

  /** Misra–Gries(k) over one partition's token stream: on a hit
    * increment; on a miss insert if a counter is free, else decrement
    * every counter (dropping zeros). Classic guarantee: any item with
    * partition count > N_p/(k+1) survives, so any token with GLOBAL
    * count > N/(k+1) survives in at least one partition (its global
    * excess cannot be diluted below the local bound everywhere at once).
    */
  private[graft] def misraGries(it: Iterator[String],
      k: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Array[Long]](2 * k)
    while (it.hasNext) {
      val x = it.next()
      val c = counters.get(x)
      if (c != null) c(0) += 1
      else if (counters.size < k) counters.put(x, Array(1L))
      else {
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val ent = e.next()
          ent.getValue()(0) -= 1
          if (ent.getValue()(0) == 0) e.remove()
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala.toList.iterator
  }

  /** Exact `(token, n)` rows for every token whose corpus-wide count is
    * at least `ceil(minFrac * totalTokens)`, ordered by count descending
    * then token. Tokens are the whitespace-split lowercase convention
    * shared with the DuckDB oracles ([[TextAnalysis.tokens]]); empty
    * tokens (whitespace-only docs) are excluded on both sides.
    */
  def heavyTokens(docs: DataFrame, minFrac: Double,
      textCol: String = "text"): DataFrame = {
    require(minFrac > 0 && minFrac < 1, "minFrac in (0, 1)")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = math.max(8, math.ceil(2.0 / minFrac).toInt)
    // materialize the token stream ONCE: the sketch pass, the total
    // count, and the confirm aggregation are three separate jobs, and
    // without a barrier a nondeterministic source could show each a
    // different stream, voiding the superset guarantee (and tokenization
    // would run 3x regardless)
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .localCheckpoint(false)
    val candidates = toks.as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF("token").distinct()
    val total = toks.count()
    val thresh = math.ceil(minFrac * total).toLong
    toks.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") >= thresh)
      .orderBy(col("n").desc, col("token"))
  }
}
