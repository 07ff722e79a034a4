package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // ---- incremental profiling against a persisted sketch index ----------
  //
  // The streaming/batch-append analog of `summarize` (and the profiling
  // counterpart of [[IncrementalDedup]]): each ingested batch contributes
  // one Datasketches-HLL sketch + exact null/nonnull counts per column
  // (a few KB per batch), and the corpus-wide profile is a MERGE of the
  // persisted sketches — never a rescan of prior batches. At 100 TB this
  // is the only viable shape for "distinct user_ids to date": the index
  // grows by O(cols) rows per batch while the data grows by terabytes,
  // and HLL union is exact w.r.t. the sketch semantics (no accuracy decay
  // from merging, unlike sampling).

  /** Sketch one batch's `cols` into `indexDir` (append-only parquet).
    * One row per column: `(col_name, sketch, n_nonnull, n_nulls)`.
    * Columns outside the HLL-supported types (int/long/string/binary) are
    * sketched on their canonical string form — distinctness of string
    * representations, which matches the merged estimate's contract. */
  def sketchBatch(df: DataFrame, cols: Seq[String], indexDir: String): Unit = {
    require(cols.nonEmpty, "sketch of zero columns")
    import org.apache.spark.sql.types._
    def sketchSql(c: String) = df.schema(c).dataType match {
      case IntegerType | LongType | StringType | BinaryType => s"`$c`"
      case _ => s"CAST(`$c` AS STRING)"
    }
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        expr(s"hll_sketch_agg(${sketchSql(c)}, 12)").as(s"__sk_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__sk_$c").as("sketch"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_nulls"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
      .coalesce(1)
      .write.mode("append").parquet(indexDir)
  }

  /** Corpus-wide profile from the persisted index alone:
    * `(col_name, n_nonnull, n_nulls, n_distinct_est)`. Cost is
    * O(batches x cols) index rows — independent of corpus size. */
  def mergedProfile(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir)
      .groupBy(col("col_name"))
      .agg(sum(col("n_nonnull")).as("n_nonnull"),
        sum(col("n_nulls")).as("n_nulls"),
        expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
          .as("n_distinct_est"))
}
