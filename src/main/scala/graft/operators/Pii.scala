package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy-scrub stage every public
  * training corpus passes through before release (the Dolma/FineWeb
  * pipeline stage): find emails, phone numbers, IPv4 addresses, and long
  * digit runs (account/ID numbers), count them per document, and replace
  * them with typed sentinel tokens.
  *
  * Patterns are ASCII-only character classes and bounded quantifiers, so
  * the Java (Spark) and RE2 (DuckDB) regex dialects match identically —
  * the whole scan/redact pipeline is oracle-checkable. Detection and
  * redaction are SEQUENTIAL in declaration order: each pattern counts and
  * redacts over the text as left by the previous pattern, so a digit run
  * inside an already-redacted phone number is never double-counted, and
  * the count column for a category is exactly the number of sentinel
  * tokens of that category in the final redacted text.
  *
  * Everything is codegen'd `regexp_extract_all` / `regexp_replace`
  * projections — no UDF, no shuffle, scan-bound at any corpus size.
  */
object Pii {

  /** (category, regex, sentinel), applied in order. Order matters:
    * IPv4 before digit-runs (an IPv4 octet chain is not an ID number),
    * phones before digit-runs (a formatted phone is not an ID). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("digits", "[0-9]{9,}", "<ID>"))

  /** Per-document PII scan + redaction: one row per input row with
    * `n_<category>` counts (longs, sequential semantics as above) and
    * the fully-redacted text in `redacted`. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val start = docs.select(col(idCol).as("id"), col(textCol).as("t0"))
    val (scanned, lastT) = patterns.zipWithIndex
      .foldLeft((start, "t0")) { case ((acc, tPrev), ((cat, re, tok), i)) =>
        val tNext = s"t${i + 1}"
        (acc
          .withColumn(s"n_$cat",
            size(regexp_extract_all(col(tPrev), lit(re), lit(0))).cast("long"))
          .withColumn(tNext, regexp_replace(col(tPrev), re, tok)),
          tNext)
      }
    scanned.select(col("id") +:
      patterns.map { case (cat, _, _) => col(s"n_$cat") } :+
      col(lastT).as("redacted"): _*)
  }

  /** Per-group PII exposure rollup over a [[redact]] frame: document
    * counts, per-category totals, and the share of documents carrying
    * ANY PII (micro-scaled exact ratio) — the per-source privacy report
    * a release review reads. `grouped` is the redact output joined with
    * the grouping column. */
  def exposureReport(redacted: DataFrame, grpCol: String): DataFrame = {
    val anyPii = patterns
      .map { case (cat, _, _) => col(s"n_$cat") > 0L }
      .reduce(_ || _)
    val aggs = (count(lit(1)).as("n_docs") +:
      patterns.map { case (cat, _, _) =>
        sum(col(s"n_$cat")).as(s"tot_$cat") }) :+
      sum(when(anyPii, 1L).otherwise(0L)).as("n_docs_with_pii")
    redacted.groupBy(col(grpCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("pii_rate_micro", expr(
        "CAST(round(1e6 * n_docs_with_pii / n_docs) AS BIGINT)"))
  }

  /** The DuckDB twin of [[redact]]'s sequential pipeline: the nested
    * `regexp_replace(..., 'g')` chain up to (excluding) pattern `i`,
    * applied to `base` — shared so every oracle replays the exact
    * same intermediate text the engine counted on. */
  def duckTextBefore(base: String, i: Int): String =
    patterns.take(i).foldLeft(base) { case (acc, (_, re, tok)) =>
      s"regexp_replace($acc, '$re', '$tok', 'g')"
    }
}
