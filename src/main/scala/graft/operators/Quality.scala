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

  /** One row per rule: (rule, violations), rule names as above, in the
    * contract's declared order. Results are matched back to rules BY
    * POSITION, not by name: two rules of the same type on the same column
    * (two InRange probes with different bounds, two ForeignKey gates to
    * different refs) share a display name, and a name-keyed map would
    * silently report one rule's count for both rows — a contract gate
    * could pass on the overwritten rule's violations. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    val scanAggs: Seq[(Int, Column)] = rules.zipWithIndex.collect {
      case (NotNull(c), i) => i -> cnt(col(c).isNull)
      case (InRange(c, lo, hi), i) =>
        i -> cnt(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case (InSet(c, vs), i) =>
        i -> cnt(col(c).isNotNull && !col(c).isin(vs: _*))
      case (MatchesRegex(c, re), i) =>
        i -> cnt(col(c).isNotNull && !col(c).rlike(re))
      case (Unique(cs), i) =>
        // count(when(...)) counts fully-non-null keys, matching
        // count(DISTINCT ...)'s any-null row skip
        i -> (count(when(
            cs.map(col(_).isNotNull).reduce(_ && _), lit(1))) -
          countDistinct(cs.head, cs.tail: _*)).cast("long")
    }
    val scanned: Seq[(Int, Long)] =
      if (scanAggs.isEmpty) Seq.empty
      else {
        // coalesce guards the empty-table edge: sum() over zero rows is
        // NULL, and a contract run on an empty ingest must report zero
        // violations, not throw
        val row = df.agg(coalesce(scanAggs.head._2, lit(0L)).as("a0"),
          scanAggs.tail.zipWithIndex.map { case ((_, c), i) =>
            coalesce(c, lit(0L)).as(s"a${i + 1}") }: _*).head()
        scanAggs.zipWithIndex.map { case ((ri, _), i) => ri -> row.getLong(i) }
      }
    val fks: Seq[(Int, Long)] = rules.zipWithIndex.collect {
      case (ForeignKey(c, ref, rc), i) =>
        i -> df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)), Seq(c), "left_anti").count()
    }
    val byIdx = (scanned ++ fks).toMap
    import spark.implicits._
    rules.zipWithIndex.map { case (r, i) => (r.name, byIdx(i)) }
      .toDF("rule", "violations")
  }
}
