package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, TextAnalysis}

class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def toks(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(Bpe.tokens(col("text")).as("t"))
      .head().getSeq[String](0)

  test("priority merge loop builds up multi-level merges") {
    // the: (t,h) then (th,e); scanner: (a,n),(e,r),(s,c),(sc,an) by rank
    assert(toks("the scanner") == Seq("the", "scan", "n", "er"))
    assert(toks("table query window") ==
      Seq("table", "query", "window"))
    assert(toks("") == Seq.empty)
  }

  test("pretokenization: letter runs, digit runs, single symbols") {
    // win | 32 | . | dll | ! -> win; 3,2; .; d,l,l; !
    assert(toks("win32.dll!") ==
      Seq("win", "3", "2", ".", "d", "l", "l", "!"))
    assert(Seq("win32.dll!").toDF("text")
      .select(Bpe.tokenCount(col("text"))).head().getInt(0) == 8)
  }

  /** The oracle's rank-order fold: symbols self-delimited as `(sym)` so
    * consecutive pair occurrences share no characters, one left-to-right
    * non-overlapping replace per merge — mirrors the DuckDB
    * `list_reduce` replay byte-for-byte.
    */
  private def sequentialBpe(text: String): Seq[String] = {
    val pat = TextAnalysis.BpeishPattern.r
    pat.findAllIn(text).flatMap { w =>
      val s0 = w.toCharArray.map(c => s"($c)").mkString
      val merged = Bpe.DemoMerges.foldLeft(s0) { case (s, (a, b)) =>
        s.replace(s"($a)($b)", s"($a$b)")
      }
      merged.stripPrefix("(").stripSuffix(")").split("\\)\\(").toSeq
    }.toSeq
  }

  test("priority loop == rank-order fold on the topologically consistent " +
      "fixture table (the oracle-equivalence invariant)") {
    val corpusWords = Seq("the", "scanner", "table", "batch", "query",
      "window", "data", "join", "key", "value", "scan", "row", "thethe",
      "tabatable", "ananan", "scscan", "winwind", "xyzzy")
    val rnd = new scala.util.Random(42)
    val alphabet = "theansciorlvbqudjwky".toCharArray
    val fuzz = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = (corpusWords ++ fuzz).mkString(" ") ::
      corpusWords.map(w => s"$w, $w!").toList
    texts.foreach { t =>
      assert(toks(t) == sequentialBpe(t), s"diverged on: $t")
    }
  }

  test("trained merge table: learns the dominant words, is topologically " +
      "consistent, and compresses the training corpus") {
    // fully fusing the+table+scan takes exactly 9 merges (2+4+3, no
    // shared intermediates), and every unfused dominant pair counts 50 >
    // the rare words' 5 — so 9 merges fuse the dominant words and cannot
    // touch the rare ones
    val corpus = Seq.fill(50)("the table scan")
      .union(Seq.fill(5)("zq xv")).toDF("text")
    val trained = Bpe.trainMerges(corpus, nMerges = 9)
    assert(trained.size == 9)
    // topological consistency: every part is a char or an earlier output
    val outputs = scala.collection.mutable.Set[String]()
    trained.foreach { case (a, b) =>
      assert(a.length == 1 || outputs.contains(a), s"inconsistent part $a")
      assert(b.length == 1 || outputs.contains(b), s"inconsistent part $b")
      outputs += a + b
    }
    // the dominant words end up as single tokens
    val toksOf = Seq("the table scan").toDF("text")
      .select(graft.plans.BpeExpr.tokenize(col("text"), trained,
        TextAnalysis.BpeishPattern))
      .head().getSeq[String](0)
    assert(toksOf == Seq("the", "table", "scan"), s"got $toksOf")
    // rare words stay character-level
    val rare = Seq("zq").toDF("text")
      .select(graft.plans.BpeExpr.tokenize(col("text"), trained,
        TextAnalysis.BpeishPattern))
      .head().getSeq[String](0)
    assert(rare == Seq("z", "q"))
    // determinism: retraining yields the identical table
    assert(Bpe.trainMerges(corpus, nMerges = 9) == trained)
  }

  test("merge-table save/load round-trip: table identical, tokenize " +
      "through the loaded table == tokenize through the original") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_").toString
    // demo table AND a freshly trained table (empty strings, unicode-ish
    // symbols, single chars all survive the parquet round trip)
    val corpus = Seq("the cat sat", "the bat", "scan the table")
      .toDF("text")
    for (table <- Seq(Bpe.DemoMerges, Bpe.trainMerges(corpus, nMerges = 7))) {
      Bpe.saveMerges(spark, table, s"$dir/m")
      val loaded = Bpe.loadMerges(spark, s"$dir/m")
      assert(loaded == table)
      val texts = Seq("the query windows scan", "tables батч 123!").toDF("text")
      val orig = texts.select(Bpe.tokens(col("text"), table).as("t"))
        .as[Seq[String]].collect().toSeq
      val viaLoad = texts.select(Bpe.tokens(col("text"), loaded).as("t"))
        .as[Seq[String]].collect().toSeq
      assert(viaLoad == orig)
    }
    // empty table round-trips to an empty table (schema preserved)
    Bpe.saveMerges(spark, Seq.empty, s"$dir/empty")
    assert(Bpe.loadMerges(spark, s"$dir/empty") == Seq.empty)
  }

  test("java replace is leftmost non-overlapping: 'aaa' under (a,a)") {
    // both algorithms must merge leftmost-first: a a a -> (aa) a
    val merges = Seq(("a", "a"))
    val out = Seq("aaa").toDF("text")
      .select(graft.plans.BpeExpr.tokenize(col("text"), merges,
        TextAnalysis.BpeishPattern).as("t"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }
}
