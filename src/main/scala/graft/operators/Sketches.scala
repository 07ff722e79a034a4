package graft.operators

import org.apache.spark.sql.DataFrame
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
}
