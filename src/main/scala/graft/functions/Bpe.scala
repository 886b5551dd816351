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
}
