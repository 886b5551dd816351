package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass evaluator for the C4/Gopher quality-rule metrics: ONE
  * tokenization + ONE line/paragraph split per document, all nine metrics
  * from the same pass, returned as a struct.
  *
  * Semantically identical (field for field, incl. trim-is-spaces-only,
  * code-point lengths, and argmax/first-wins conventions) to the composed
  * builders in [[graft.functions.TextAnalysis]] — parity-asserted by
  * TextAnalysisSpec — and to the DuckDB oracle. The composed versions each
  * re-split/re-sort the text and pay interpreted higher-order-fold costs
  * per element; measured ~2.6 ms/doc across the 8 metrics at sf0.1 doc
  * sizes vs ~50 us here. CodegenFallback is deliberate: the eval is a
  * single tight JVM pass producing a 9-field struct, and the surrounding
  * projection stays trivially cheap relative to it.
  */
case class QualityRulesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = QualityRulesExpr.schema

  /** Space-only trim — Spark `trim()` / DuckDB `trim()` semantics (Java's
    * String.trim also eats control chars and would diverge on \r).
    */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  private def nChars(s: String): Int = s.codePointCount(0, s.length)

  private val symbolPattern = java.util.regex.Pattern.compile("#|\\.\\.\\.")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val trimmedLower = trimSpaces(text.toLowerCase(java.util.Locale.ROOT))
    val toks: Array[String] =
      if (trimmedLower.isEmpty) Array.empty
      else trimmedLower.split("\\s+", -1)
    val ntok = toks.length
    val nchar = nChars(text)

    val lines = text.split("\n", -1).map(trimSpaces).filter(_.nonEmpty)
    val paras = text.split("\\n\\s*\\n", -1).map(trimSpaces).filter(_.nonEmpty)

    def dupFraction(arr: Array[String]): Double =
      if (arr.isEmpty) 0.0
      else 1.0 - arr.distinct.length.toDouble / arr.length

    // duplicate-line characters: all occurrences of any line seen >= 2x
    var dupChars = 0L
    var totChars = 0L
    if (lines.nonEmpty) {
      val counts = mutable.HashMap.empty[String, Int]
      lines.foreach(l => counts.update(l, counts.getOrElse(l, 0) + 1))
      counts.foreach { case (l, c) =>
        val chars = c.toLong * nChars(l)
        totChars += chars
        if (c >= 2) dupChars += chars
      }
    }
    val dupLineCharFrac =
      if (totChars == 0) 0.0 else dupChars.toDouble / totChars

    // most-repeated word 2-gram: max over grams of occurrences x length
    var best = 0L
    if (ntok >= 2) {
      val counts = mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < ntok - 1) {
        val g = toks(i) + " " + toks(i + 1)
        counts.update(g, counts.getOrElse(g, 0) + 1)
        i += 1
      }
      counts.foreach { case (g, c) =>
        val covered = c.toLong * nChars(g)
        if (covered > best) best = covered
      }
    }
    val topBigramFrac = if (nchar == 0) 0.0 else best.toDouble / nchar

    var nsym = 0
    val mt = symbolPattern.matcher(text)
    while (mt.find()) nsym += 1

    def lineFrac(p: String => Boolean): Double =
      if (lines.isEmpty) 0.0
      else lines.count(p).toDouble / lines.length

    val alphaFrac =
      if (ntok == 0) 0.0
      else toks.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / ntok

    InternalRow(
      ntok,
      dupFraction(lines),
      dupFraction(paras),
      dupLineCharFrac,
      topBigramFrac,
      if (ntok == 0) 0.0 else nsym.toDouble / ntok,
      lineFrac(l => l.charAt(0) == '-' || l.charAt(0) == '*' ||
        l.charAt(0) == '•'),
      lineFrac(_.endsWith("...")),
      alphaFrac)
  }

  override protected def withNewChildInternal(
      newChild: Expression): QualityRulesExpr = copy(child = newChild)
}

object QualityRulesExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_para_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_bigram_char_frac", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("alpha_word_frac", DoubleType, nullable = false)))

  /** Column-API entry point: all nine quality-rule metrics as one struct.
    * Materialize the struct behind an exchange (repartition) before fanning
    * it out into per-field columns, or each field re-runs the whole pass.
    */
  def rules(text: Column): Column =
    Bridge.column(QualityRulesExpr(Bridge.expression(text)))
}
