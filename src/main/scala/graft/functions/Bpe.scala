package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level BPE tokenizer API over the native
  * [[graft.plans.BpeExpr.BpeTokenizeExpr]], plus the demo merge table the
  * q69/q56 oracles replay.
  *
  * A real deployment loads its trained merge table (a few MB) and passes
  * it to [[tokens]] — the table rides to executors inside the serialized
  * expression (broadcast-vocabulary pattern). [[DemoMerges]] is a small
  * TOPOLOGICALLY CONSISTENT fixture (each merge's parts are single chars
  * or outputs of earlier merges — the invariant every trained table has),
  * which is exactly the property that makes the priority merge loop
  * replayable as a rank-order fold in the DuckDB oracle (see BpeExpr
  * scaladoc).
  */
object Bpe {

  /** Fixture merge table: common English letter pairs building up to a
    * few whole corpus words. Rank = position.
    */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("e", "r"),
    ("a", "t"), ("o", "n"), ("r", "e"), ("s", "t"), ("a", "r"),
    ("o", "r"), ("l", "e"), ("c", "a"), ("s", "c"), ("sc", "an"),
    ("r", "o"), ("ro", "w"), ("k", "e"), ("ke", "y"), ("v", "a"),
    ("va", "l"), ("val", "u"), ("valu", "e"), ("t", "a"), ("ta", "b"),
    ("tab", "le"), ("b", "at"), ("bat", "c"), ("batc", "h"), ("q", "u"),
    ("qu", "er"), ("quer", "y"), ("d", "at"), ("dat", "a"), ("j", "o"),
    ("jo", "in"), ("w", "in"), ("win", "d"), ("wind", "o"), ("windo", "w"))

  /** Final BPE token stream of `text` (pretokenized by
    * [[TextAnalysis.BpeishPattern]]).
    */
  def tokens(text: Column,
      merges: Seq[(String, String)] = DemoMerges): Column =
    graft.plans.BpeExpr.tokenize(text, merges, TextAnalysis.BpeishPattern)

  /** Real token count under the merge table — the drop-in replacement for
    * [[TextAnalysis.bpeishTokenCount]] in token-budget accounting.
    */
  def tokenCount(text: Column,
      merges: Seq[(String, String)] = DemoMerges): Column =
    size(tokens(text, merges))

  /** TRAIN a merge table from a corpus — classic BPE training (Sennrich
    * et al. 2016) over a driver-bounded word-frequency vocabulary, the
    * same sample-bounded driver-side training convention as
    * `ivfCentroids`' Lloyd and `pqCodebooks`: the DISTRIBUTED step is one
    * explode+groupBy producing (pretoken, count) — at any corpus size the
    * collected vocab is bounded by `maxVocab` most-frequent words, which
    * is what carries virtually all pair mass anyway — and the merge loop
    * runs locally over that dict (nMerges x vocab x wordLen).
    *
    * Deterministic: ties on pair count break lexicographically, so the
    * same corpus always yields the same table. The result is
    * topologically consistent BY CONSTRUCTION (a merge is only counted
    * over symbols that already exist when it is learned) — exactly the
    * property that makes the q69 oracle's rank-order fold replay
    * [[graft.plans.BpeExpr.BpeTokenizeExpr]] faithfully (BpeSpec asserts
    * consistency of trained tables).
    */
  /** Persist a merge table as a tiny (rank, left, right) parquet — a
    * production tokenizer is trained ONCE and shipped as a versioned
    * artifact, not retrained per run. The table is driver-sized by
    * construction (nMerges rows), so the single-file write is the right
    * shape.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table saved by [[saveMerges]], rank order restored —
    * the result plugs straight into [[tokens]]/[[tokenCount]] (the
    * in-plan literal is rebuilt from it, same broadcast-vocabulary
    * pattern as a freshly trained table).
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  def trainMerges(docs: org.apache.spark.sql.DataFrame, nMerges: Int,
      maxVocab: Int = 10000, textCol: String = "text")
      : Seq[(String, String)] = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, regexp_extract_all}
    val vocab: Array[(String, Long)] = docs
      .select(explode(
        regexp_extract_all(col(textCol), lit(TextAnalysis.BpeishPattern),
          lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (i < nMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.merge(k, n, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) i = nMerges
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && (k._1 + "\u0000" + k._2) <
              (best._1._1 + "\u0000" + best._1._2))) best = (k, v)
        }
        val (a, b) = best._1
        merges += ((a, b))
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.toArray, n)
        }
        i += 1
      }
    }
    merges.toSeq
  }
}
