package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the `ANALYZE TABLE` analog a large-scale pipeline
  * runs for data-quality gates and drift monitoring (null-rate spikes,
  * cardinality collapse, value-range excursions).
  *
  * One pass over the data: every per-column aggregate lands in a single
  * `agg(...)` (Catalyst plans the distinct counts through one Expand), and
  * the single result row is pivoted to long format driver-side — the
  * pivot touches one row, never data. min/max are emitted as strings so
  * heterogeneous columns share one schema; callers profiling doubles
  * should pre-scale to exact integers (float formatting is
  * engine-specific).
  */
object Profile {

  /** `(col_name, n_nonnull, n_nulls, n_distinct, min_s, max_s)` per
    * requested column. `exactDistinct = false` swaps the distinct counts
    * for HLL++ estimates (2% rsd) — the 100 TB path: exact multi-column
    * distincts expand the input once per column through the shuffle, while
    * the sketches keep the pass fully map-side-combined. */
  def summarize(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    def distinctAgg(c: String) =
      if (exactDistinct) countDistinct(col(c))
      else approx_count_distinct(col(c), 0.02)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        distinctAgg(c).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
