package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub stage every production corpus
  * pipeline runs before training (C4 and successors strip emails, phone
  * numbers, IP addresses, and ID numbers; the reference is pure ETL and
  * has no equivalent, so this extends the curation surface).
  *
  * Design: five PII classes, each a regex valid with IDENTICAL semantics
  * in Java's engine (Spark codegen'd `RegExpReplace`/`RegExpCount`) and
  * RE2 (the DuckDB oracle) — no lookarounds, no backreferences, ASCII
  * word boundaries only. Classes are adjudicated SEQUENTIALLY in a fixed
  * priority order: each class is counted and redacted on the text with
  * all higher-priority classes already replaced by their tokens, so
  * overlapping candidates (an SSN that a loose phone pattern would also
  * hit) are claimed deterministically by exactly one class in any engine.
  *
  * Redaction tokens contain no digits or '@', so no token can create or
  * extend a match of any class — which is what makes [[redact]]
  * IDEMPOTENT (TextAnalysisSpec asserts redact(redact(t)) == redact(t)).
  *
  * Scale posture: pure row-local scalar expressions (compiled-regex
  * per-operator, whole-stage codegen, no shuffle, no UDF). The sequential
  * chain nests replaces 5 deep — ~15 regex passes per doc worst case,
  * all streaming over the text; measured alongside the quality rules this
  * stays tens of µs/doc.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val CcPattern = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"
  val PhonePattern =
    "(?:\\+?\\d{1,3}[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** (class name, pattern, redaction token) in adjudication order —
    * narrower/structured classes before the loose phone pattern, so e.g.
    * `123-45-6789` is an SSN, never a phone fragment.
    */
  val Classes: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "<EMAIL>"),
    ("ipv4", Ipv4Pattern, "<IP>"),
    ("ssn", SsnPattern, "<SSN>"),
    ("cc", CcPattern, "<CC>"),
    ("phone", PhonePattern, "<PHONE>"))

  /** Text with every PII class replaced by its token (sequential order). */
  def redact(text: Column): Column =
    Classes.foldLeft(text) { case (t, (_, p, tok)) =>
      regexp_replace(t, lit(p), lit(tok))
    }

  /** Per-class hit counts as columns named `n_<class>`, each counted on
    * the prior classes' redaction output (see object doc), plus the total.
    */
  def scanColumns(text: Column): Seq[Column] = {
    val (counts, _) = Classes.foldLeft((Seq.empty[Column], text)) {
      case ((acc, t), (name, p, tok)) =>
        (acc :+ regexp_count(t, lit(p)).as(s"n_$name"),
          regexp_replace(t, lit(p), lit(tok)))
    }
    counts :+ counts.map(c => c.cast("long")).reduce(_ + _).as("n_pii")
  }

  /** Total PII hits across all classes (the curation gate predicate). */
  def piiTotal(text: Column): Column =
    scanColumns(text).last
}
