package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation (the Deequ/Great-Expectations
  * pattern reduced to its Spark-native core): a contract is a list of
  * rules; validation emits one row per rule with its violation count, so
  * an ingest gate is `validate(...).filter(violations > 0).isEmpty`.
  *
  * Scale shape: every row-local rule (not-null, range, set-membership,
  * regex) folds into ONE conditional-sum aggregate — the whole contract
  * costs one corpus scan regardless of rule count, like
  * [[Profile.summarize]]. Uniqueness rides the same pass as
  * `count(*) − count(DISTINCT key)`. Referential-integrity rules are the
  * only extra passes: one left-anti count each against the (broadcastable
  * or key-joined) reference.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** The tuple of `cols` must be unique across rows (violations = rows
    * beyond the first of each duplicated key). Rows where any key column
    * is NULL are ignored, like SQL UNIQUE — declare [[NotNull]] alongside
    * if NULL keys are themselves violations. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col)"
  }
  /** Non-null `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }
  /** Non-null string `col` must match `regex` (rlike semantics —
    * unanchored; anchor the pattern for full-match). */
  final case class MatchesRegex(col: String, regex: String) extends Rule {
    def name = s"matches_regex($col)"
  }
  /** Every non-null `col` value must exist in `refCol` of `ref`. */
  final case class ForeignKey(col: String, ref: DataFrame, refCol: String)
      extends Rule {
    def name = s"foreign_key($col)"
  }

  /** One row per rule: (rule, violations), rule names as above. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    val scanAggs: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => r.name -> cnt(col(c).isNull)
      case r @ InRange(c, lo, hi) =>
        r.name -> cnt(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case r @ InSet(c, vs) =>
        r.name -> cnt(col(c).isNotNull && !col(c).isin(vs: _*))
      case r @ MatchesRegex(c, re) =>
        r.name -> cnt(col(c).isNotNull && !col(c).rlike(re))
      case r @ Unique(cs) =>
        // count(when(...)) counts fully-non-null keys, matching
        // count(DISTINCT ...)'s any-null row skip
        r.name -> (count(when(
            cs.map(col(_).isNotNull).reduce(_ && _), lit(1))) -
          countDistinct(cs.head, cs.tail: _*)).cast("long")
    }
    val scanned: Seq[(String, Long)] =
      if (scanAggs.isEmpty) Seq.empty
      else {
        // coalesce guards the empty-table edge: sum() over zero rows is
        // NULL, and a contract run on an empty ingest must report zero
        // violations, not throw
        val row = df.agg(coalesce(scanAggs.head._2, lit(0L)).as("a0"),
          scanAggs.tail.zipWithIndex.map { case ((_, c), i) =>
            coalesce(c, lit(0L)).as(s"a${i + 1}") }: _*).head()
        scanAggs.zipWithIndex.map { case ((n, _), i) => n -> row.getLong(i) }
      }
    val fks: Seq[(String, Long)] = rules.collect {
      case r @ ForeignKey(c, ref, rc) =>
        r.name -> df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)), Seq(c), "left_anti").count()
    }
    // preserve the contract's declared rule order
    val byName = (scanned ++ fks).toMap
    import spark.implicits._
    rules.map(r => (r.name, byName(r.name))).toDF("rule", "violations")
  }
}
