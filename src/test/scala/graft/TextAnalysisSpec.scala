package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  private def piiScan(text: String): (Map[String, Int], String) = {
    import graft.functions.Pii
    val row = one(text).select(
      Pii.scanColumns(col("text")) :+ Pii.redact(col("text")).as("red"): _*)
      .head()
    val names = Pii.Classes.map(c => s"n_${c._1}")
    (names.zipWithIndex.map { case (n, i) => n -> row.getInt(i) }.toMap,
      row.getString(row.length - 1))
  }

  test("PII scan: each class detected, counted, and redacted") {
    val (counts, red) = piiScan(
      "mail a.user+tag@sub.example.org or bob@x.io, host 192.168.0.1, " +
        "ssn 123-45-6789, card 4111-1111-1111-1234, call +1-555-123-4567")
    assert(counts("n_email") == 2)
    assert(counts("n_ipv4") == 1)
    assert(counts("n_ssn") == 1)
    assert(counts("n_cc") == 1)
    assert(counts("n_phone") == 1)
    assert(red == "mail <EMAIL> or <EMAIL>, host <IP>, ssn <SSN>, " +
      "card <CC>, call <PHONE>")
  }

  test("PII adjudication order: an SSN is claimed by the SSN class, " +
      "never counted again by the looser phone pattern") {
    val (counts, red) = piiScan("ids 123-45-6789 and 987-65-4321 only")
    assert(counts("n_ssn") == 2 && counts("n_phone") == 0)
    assert(red == "ids <SSN> and <SSN> only")
    // and a 4-4-4-4 card is cc, not phone
    val (c2, _) = piiScan("pay 1234-5678-9012-3456 now")
    assert(c2("n_cc") == 1 && c2("n_phone") == 0)
  }

  test("PII redaction is idempotent: tokens match no class") {
    import graft.functions.Pii
    val texts = Seq(
      "x@y.com 10.0.0.1 123-45-6789 4111-1111-1111-1111 (555) 123-4567",
      "no pii at all in this perfectly clean sentence",
      "")
    val df = texts.toDF("text").select(
      Pii.redact(col("text")).as("r1"),
      Pii.redact(Pii.redact(col("text"))).as("r2"),
      Pii.piiTotal(Pii.redact(col("text"))).as("n"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getLong(2) == 0L)
    }
  }

  test("PII total gates clean docs through and dirty docs out") {
    import graft.functions.Pii
    val df = Seq(1 -> "clean text", 2 -> "write to me@example.com")
      .toDF("id", "text")
      .filter(Pii.piiTotal(col("text")) === 0)
    assert(df.select("id").as[Int].collect().toSeq == Seq(1))
  }

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

  test("Gopher repetition rules: duplicate line/para and top-bigram " +
      "fractions computed by the sorted folds") {
    import graft.functions.{TextAnalysis => TA}
    val docs = Seq(
      (1L, "a normal line of english text\nand a different second line"),
      (2L, "dup line\ndup line\ndup line\nunique"),
      (3L, "spam spam spam spam spam spam"),
      (4L, "para one\n\npara one\n\npara two")
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"),
      TA.duplicateLineFraction(col("text")).as("dlf"),
      TA.duplicateParagraphFraction(col("text")).as("dpf"),
      TA.duplicateLineCharFraction(col("text")).as("dlcf"),
      TA.topBigramCharFraction(col("text")).as("tbcf"))
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(m(1L)._1 == 0.0 && m(1L)._3 == 0.0)
    assert(m(2L)._1 == 0.5)                   // 4 lines, 2 distinct
    assert(m(2L)._3 == 24.0 / 30.0)           // 3x"dup line"(8) over 30
    assert(m(4L)._2 == 1.0 - 2.0 / 3.0)       // 3 paras, 2 distinct
    // "spam spam" x5 covers 5*9=45 of 29 chars — way past any threshold
    assert(m(3L)._4 == 45.0 / 29.0)
  }

  test("Gopher format rules: symbol ratio, bullet/ellipsis lines, alpha " +
      "words") {
    import graft.functions.{TextAnalysis => TA}
    val docs = Seq(
      (1L, "- one\n- two\n- three"),
      (2L, "trailing off...\nand again...\nbut not here"),
      (3L, "### markdown #soup... of # symbols"),
      (4L, "1 2 3 4 real words here")
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"),
      TA.bulletLineFraction(col("text")).as("blf"),
      TA.ellipsisLineFraction(col("text")).as("elf"),
      TA.symbolToWordRatio(col("text")).as("swr"),
      TA.alphaWordFraction(col("text")).as("awf"))
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(m(1L)._1 == 1.0)                   // every line bulleted
    assert(m(2L)._2 == 2.0 / 3.0)             // 2 of 3 lines end in ...
    assert(m(3L)._3 == 6.0 / 6.0)             // 5x'#' + 1x'...' over 6 tokens
    assert(m(4L)._4 == 3.0 / 7.0)             // digits aren't alpha words
  }

  test("native QualityRulesExpr == composed TextAnalysis metrics, " +
      "edge cases included") {
    import graft.functions.{TextAnalysis => TA}
    import graft.plans.QualityRulesExpr
    val docs = Seq(
      (1L, "a normal line of english text\nand a different second line"),
      (2L, "dup line\ndup line\ndup line\nunique"),
      (3L, "spam spam spam spam spam spam"),
      (4L, "para one\n\npara one\n\npara two"),
      (5L, "- one\n* two\n• three"),
      (6L, "trailing off...\nand again...\nplain"),
      (7L, "### markdown #soup... of # symbols"),
      (8L, "1 2 3 4 real words here"),
      (9L, "   "),                      // spaces only: zero tokens
      (10L, "single"),                  // one token: no bigrams
      (11L, "line with cr\r\nnext line") // \r must survive space-only trim
    ).toDF("doc_id", "text")
    val rows = docs.select(
      QualityRulesExpr.rules(col("text")).as("qr"),
      TA.tokenCount(col("text")).as("c_ntok"),
      TA.duplicateLineFraction(col("text")).as("c_dlf"),
      TA.duplicateParagraphFraction(col("text")).as("c_dpf"),
      TA.duplicateLineCharFraction(col("text")).as("c_dlcf"),
      TA.topBigramCharFraction(col("text")).as("c_tbcf"),
      TA.symbolToWordRatio(col("text")).as("c_swr"),
      TA.bulletLineFraction(col("text")).as("c_blf"),
      TA.ellipsisLineFraction(col("text")).as("c_elf"),
      TA.alphaWordFraction(col("text")).as("c_awf"),
      col("doc_id")).collect()
    rows.foreach { r =>
      val qr = r.getStruct(0)
      val id = r.getLong(10)
      assert(qr.getInt(0) == r.getInt(1), s"n_tokens doc $id")
      Seq(1 -> 2, 2 -> 3, 3 -> 4, 4 -> 5, 5 -> 6, 6 -> 7, 7 -> 8, 8 -> 9)
        .foreach { case (qi, ci) =>
          assert(qr.getDouble(qi) == r.getDouble(ci),
            s"field $qi doc $id: native ${qr.getDouble(qi)} " +
              s"composed ${r.getDouble(ci)}")
        }
    }
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
