package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SketchExprs

/** Distributed Count-Min sketch over a key column.
  *
  * The sketch lives as a DataFrame `(ri, bucket, cnt)` with at most
  * `Depth * Width` rows — counter state never touches the driver, builds in
  * one map-side-combined aggregate, and merges across corpora by UNION ALL +
  * re-aggregate (counter addition is the CMS merge). Point queries join the
  * probe keys against the sketch and take `min(cnt)` across the Depth rows.
  *
  * At 100 TB the build cost is one pass + a shuffle of at most
  * `tasks * Depth * Width` partial rows; the sketch itself broadcasts for
  * the estimate join. Exact integer arithmetic end-to-end (constants shared
  * with the DuckDB oracle via [[graft.functions.SketchExprs]]).
  */
object Sketches {

  /** Keys are reduced into `[0, P)` before hashing — arbitrary longs
    * (xxhash64-derived ids, negatives) would overflow `a*k` and wrap to
    * negative buckets, silently breaking the no-undercount invariant.
    * In-range keys pass through unchanged, so the oracle SQL can keep
    * hashing the raw column. */
  private def inRange(keyExpr: String) =
    pmod(expr(keyExpr).cast("long"), lit(SketchExprs.P))

  /** Build the CMS table for `df[keyExpr]`. */
  def cmsBuild(df: DataFrame, keyExpr: String): DataFrame =
    df.select(inRange(keyExpr).as("k"))
      .select(explode(expr(SketchExprs.sparkCmsCells("k"))).as("c"))
      .groupBy(col("c.ri").as("ri"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimate the frequency of each distinct key in `probes[keyExpr]`:
    * `est = min_i cnt[i][h_i(key)]`. Keys absent from the sketch estimate
    * as 0 (left join + coalesce). Returns `probes` columns + `est`. */
  def cmsEstimate(probes: DataFrame, keyExpr: String,
      sketch: DataFrame): DataFrame = {
    val cells = probes
      .withColumn("__k", inRange(keyExpr))
      .withColumn("c", explode(expr(SketchExprs.sparkCmsCells("__k"))))
      .select(probes.columns.map(col) :+ col("c.ri").as("ri") :+
        col("c.bucket").as("bucket"): _*)
    cells
      .join(broadcast(sketch), Seq("ri", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- heavy hitters (mergeable approx-top-k) --------------------------
  //
  // The complement of CMS: CMS answers "how often does THIS key occur"
  // for keys you already hold; the heavy-hitter sketch answers "WHICH
  // keys dominate" without enumerating the key space. State is one
  // bounded accumulator (`maxTracked` counters) per task, combined in one
  // aggregate — at 100 TB the exact alternative is a full groupBy over
  // every distinct key, shuffled, just to throw away all but k rows.
  // When the column's distinct count fits inside `maxTracked` the counts
  // are EXACT (the oracle row runs in that regime); past it they are
  // Misra-Gries-style estimates, recall-tested on a skewed corpus in the
  // suite.

  /** Top-`k` items of `df[keyExpr]` by frequency:
    * `(item, est_count)`, one bounded-state aggregate pass. */
  def heavyHitters(df: DataFrame, keyExpr: String, k: Int,
      maxTracked: Int = 4096): DataFrame =
    df.select(expr(keyExpr).as("__hh"))
      .agg(expr(s"approx_top_k(__hh, $k, $maxTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est_count"))

  /** Accumulate one batch's heavy-hitter state into `indexDir`
    * (append-only parquet, one sketch row per batch) — the same
    * incremental-index shape as [[Profile.sketchBatch]]: the index grows
    * by one bounded sketch per batch while the data grows unbounded. */
  def heavyHittersBatch(df: DataFrame, keyExpr: String, indexDir: String,
      maxTracked: Int = 4096): Unit =
    df.select(expr(keyExpr).as("__hh"))
      .agg(expr(s"approx_top_k_accumulate(__hh, $maxTracked)").as("state"))
      .coalesce(1)
      .write.mode("append").parquet(indexDir)

  /** Corpus-wide top-`k` from the persisted index alone — combine the
    * per-batch states, estimate once. Cost is O(batches), independent of
    * corpus size. `maxTracked` must not exceed the accumulate-side value
    * (combine tightens, never widens, the tracked set). */
  def mergedHeavyHitters(spark: SparkSession, indexDir: String, k: Int,
      maxTracked: Int = 4096): DataFrame =
    spark.read.parquet(indexDir)
      .agg(expr(s"approx_top_k_estimate(" +
        s"approx_top_k_combine(state, $maxTracked), $k)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est_count"))
}
