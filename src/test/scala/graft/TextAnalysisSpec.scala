package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token counting: whitespace runs, empty text") {
    val df = one("  The quick   brown\tfox  ")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.head().getInt(0) == 4)
    assert(one("").select(TextAnalysis.tokenCount(col("text")))
      .head().getInt(0) == 0)
    assert(one("   ").select(TextAnalysis.tokenCount(col("text")))
      .head().getInt(0) == 0)
  }

  test("BPE-ish count: letter runs, digit runs, single symbols") {
    val df = one("hello world42, x-y!")
      .select(TextAnalysis.bpeishTokenCount(col("text")).as("n"))
    // hello | world | 42 | , | x | - | y | !
    assert(df.head().getInt(0) == 8)
  }

  test("language ID picks max stopword overlap; und when none") {
    val rows = Seq(
      "the cat sat of the mat and it is a thing",
      "el gato es un animal que vive en la casa",
      "der hund ist ein tier und das ist gut",
      "xyzzy qwerty plugh").toDF("text")
      .select(TextAnalysis.langIdHeuristic(col("text")).as("lang"))
      .as[String].collect()
    assert(rows.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("The  Quick FOX", "the quick fox", "the quick  fox ")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("shingles are distinct in-order n-grams") {
    val sh = one("a b c d a b c d")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("composed shingles == native ShinglesExpr, including the tiny-doc " +
      "whole-text fallback") {
    import graft.plans.TextHashExprs
    val texts = Seq("a b c d a b c d", "a b", "one", "  ",
      "x y z").toDF("text")
    val rows = texts.select(
      TextAnalysis.shingles(col("text"), 3).as("composed"),
      TextHashExprs.shingles(TextAnalysis.tokens(col("text")), 3)
        .as("native"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (c, n) => assert(c == n) }
  }

  test("quality score stays in a sane range and rewards real text") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day",
      "!!! ??? ,,, ;;; ...").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .as[Double].collect()
    assert(scores(0) > scores(1))
    assert(scores.forall(s => s >= -0.1 && s <= 1.1))
  }
}
