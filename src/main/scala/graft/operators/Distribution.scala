package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-distribution operators for cluster scale: bucketed co-located
  * joins and salted skew joins. On local[32] these are exercised by tests
  * that assert the *plan shape* (no shuffle for bucketed joins; identical
  * results for salted joins) — the properties that matter at 1000
  * executors.
  */
object Distribution {

  /** Write `df` as a bucketed, sorted table. Repeated joins/aggregations on
    * `bucketCols` then read pre-partitioned data: no exchange on either
    * side — the bucketing metadata replaces the shuffle. This is the
    * batch-ingest analog of the loader's partitioned write, aimed at join
    * keys instead of pruning predicates. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // <warehouse>/<name> below assumes an unqualified managed-table name; a
    // db-qualified name would resolve to the wrong path and risk deleting an
    // unrelated directory
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    if (spark.catalog.tableExists(table)) {
      // catalog-managed: DROP removes both the entry and its real location
      spark.sql(s"DROP TABLE `$table`")
    } else {
      // true orphan only: a previous session's in-memory catalog lost the
      // entry but the warehouse dir survived and would block CREATE TABLE
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // repartition on the bucket key first: without it every INPUT task
    // writes its own file per bucket (tasks x buckets small files — 24
    // from a 3-split scan at 8 buckets) and write parallelism is pinned
    // to the scan's split count. Hash-clustered on the bucket columns,
    // each task owns whole buckets: one file per bucket — the layout the
    // bucketed join's exchange-free promise is priced for — and the
    // write parallelizes to numBuckets tasks.
    df.repartition(numBuckets, bucketCols.map(col): _*)
      .write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Inner equi-join with salt-and-replicate skew mitigation: the skewed
    * side's rows are spread across `factor` sub-keys (uniform per-row
    * salt), the dim side is replicated `factor` times. Hot keys fan out to
    * `factor` tasks instead of one straggler. Result set is identical to
    * the plain join; AQE's skew-join handles the same problem adaptively,
    * this is the explicit form for when statistics miss (e.g. a first
    * pass over unprofiled data). */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      factor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * test/diagnostic hook for the co-location guarantees above. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning")

  /** Write `df` z-ordered on two non-negative integer dimensions: rows are
    * range-partitioned and sorted by the Morton interleave of
    * (`xCol`, `yCol`), so every output file covers a compact 2-D tile and
    * its parquet footer min/max stats prune on BOTH dimensions. A linear
    * `sortBy(x)` layout answers x-ranges well but scans every file for a
    * y-range; the z-order layout bounds file touches for either (and for
    * boxes). `targetFiles` bounds the output file count — at cluster scale
    * set it from data volume / desired file size, not task count.
    *
    * The morton key is a pure codegen'd expression
    * ([[graft.functions.ZOrderExprs]]); the write is one range exchange
    * (sampled bounds) + per-partition sort — the same cost as any
    * global-sort write. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, targetFiles: Int): Unit = {
    val keyed = df.withColumn("__z",
      expr(graft.functions.ZOrderExprs.sparkMorton2(xCol, yCol)))
    keyed
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] envelopes of `cols` for the parquet files under
    * `path` — the data-skipping evidence a z-order layout is judged by.
    * Computed from the rows themselves via `_metadata.file_path` grouping
    * (equivalent to footer stats for these single-block files). */
  def fileEnvelopes(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileEnvelopes of zero columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
