package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Count-Min sketch (Cormode & Muthukrishnan 2005): frequency estimation
  * in `depth × width` integer cells regardless of key cardinality — the
  * batch companion to [[StreamingSketch]]'s Misra-Gries heavy hitters.
  * Its 100 TB role is the BOUNDED STATE: per-shard sketches are
  * cell-wise ADDITIVE (a `groupBy(d, bucket).sum` merges any number of
  * shards into one d×w table), so a fleet of writers can maintain
  * approximate per-key counts with fixed memory and one tiny merge, where
  * an exact per-key count table grows with the key universe.
  *
  * Estimates: `est(k) = min_i cells[i][h_i(k)]` — always ≥ the true
  * count (every occurrence of k lands in all of k's cells; collisions
  * only ADD), within `ε·N` of it with probability 1−δ for
  * `width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉`. The hash family is the shared
  * deterministic [[HashExprs.perms]] pairwise-independent
  * `h_i(k) = ((a_i·(k mod P) + b_i) mod P) mod width` — exact long
  * arithmetic (a_i < P ≈ 2³⁰ keeps the product under 2⁶⁰), mirrored
  * literal-for-literal by the DuckDB oracle.
  *
  * Plan shape: building is one explode(depth) + one hash aggregate to the
  * d×w cell grain (map-side combine does the heavy lifting — the shuffle
  * carries at most depth·width rows per task); estimation joins each
  * distinct key's depth probe rows against the broadcast-sized cell table
  * and takes a min. No shuffle wider than the cell table anywhere.
  */
object CountMinSketch {

  private def bucketExpr(i: Int, width: Int): String = {
    val (a, b) = HashExprs.perms(i % HashExprs.NumPerm)
    s"(($a * (k % ${HashExprs.P}) + $b) % ${HashExprs.P}) % $width"
  }

  /** The d×w sketch of non-null long `keyCol`: (d, bucket, cnt), only
    * occupied cells (absent cell = 0; cell-wise additive across builds). */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && depth <= HashExprs.NumPerm && width > 0,
      s"need 0 < depth <= ${HashExprs.NumPerm} and width > 0")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"))
      .select(explode(expr(
        "array(" + (0 until depth).map(i =>
          s"named_struct('d', ${i}L, 'bucket', ${bucketExpr(i, width)})")
          .mkString(", ") + ")")).as("c"))
      .groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per distinct key: (key, true_cnt, est_cnt) with est ≥ true — the
    * sketch quality readout (exact counts exist here only to grade the
    * estimate; production readers query the sketch alone). */
  def estimates(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val cells = build(df, keyCol, depth, width)
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("true_cnt"))
    val probes = keys.select(col("k"), col("true_cnt"),
      explode(expr(
        "array(" + (0 until depth).map(i =>
          s"named_struct('d', ${i}L, 'bucket', ${bucketExpr(i, width)})")
          .mkString(", ") + ")")).as("c"))
      .select(col("k"), col("true_cnt"),
        col("c.d").as("d"), col("c.bucket").as("bucket"))
    // the cell table is ≤ depth·width rows by construction — broadcast
    probes.join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("k"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** DuckDB mirror of the probe-bucket struct list for key expression
    * `k` (the oracle builds/queries the sketch with the same literals). */
  def duckBuckets(k: String, depth: Int, width: Int): String =
    "[" + (0 until depth).map { i =>
      val (a, b) = HashExprs.perms(i % HashExprs.NumPerm)
      s"{'d': ${i}::BIGINT, 'bucket': (($a * (($k) % ${HashExprs.P}) + $b) % ${HashExprs.P}) % $width}"
    }.mkString(", ") + "]"
}
