package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer Lloyd k-means over embedding columns — the clustering
  * stage of corpus curation (diversity sampling, per-cluster quotas,
  * semantic bucketing before dedup).
  *
  * All arithmetic is 64-bit integer: vectors are scaled to `1/scale` units
  * once up front (`round(v * scale)` in double — exact for |v|·scale below
  * 2^52), distances are integer squared-L2, and centroid means use FLOOR
  * division, so the result is bit-identical across engines, partitionings,
  * and runs. A floating-point k-means' centroid means depend on summation
  * order, which would make every downstream assignment nondeterministic —
  * the same reduction-order hazard the integer PageRank avoids.
  *
  * Scale shape per round: one broadcast of the k centroids (k·dim longs),
  * one codegen'd zip_with/aggregate distance per (row, centroid), a
  * map-side-combinable packed-decimal `min` HASH aggregate for the argmin
  * (each task reduces its local N×k rows to one per id BEFORE the shuffle —
  * no sort, no WindowExec; asserted in ScaleOpsSpec), a shuffle-free
  * co-partitioned re-join of the winning cid onto the cached vectors, and
  * one posexplode + groupBy(cid, dim) for the new means — no driver-side
  * vectors, no cartesian beyond the deliberate row×k assignment.
  *
  * Seeds are the k lowest-id vectors (deterministic, mirrors the IVF
  * seeding fixed in round 3 — rank-based, no dense-id assumption).
  */
object KMeans {

  /** One assignment round under the seed centroids, without the
    * lineage-truncating localCheckpoint — the checkpoint in [[assign]]
    * collapses the returned frame's plan to an RDD scan, so plan-shape
    * tests (no WindowExec/SortAggregate in the argmin) must inspect this
    * hook instead. */
  private[graft] def assignmentRound(emb: DataFrame, idCol: String,
      vecCol: String, k: Int, scale: Long = 1000000L): DataFrame = {
    val scaled = scaledVectors(emb, idCol, vecCol, scale)
    assignIds(scaled, seedCentroids(scaled, k))
  }

  private def scaledVectors(emb: DataFrame, idCol: String, vecCol: String,
      scale: Long): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, v -> CAST(round(CAST(v AS DOUBLE) * $scale.0) AS BIGINT))")
        .as("xs"))

  private def seedCentroids(scaled: DataFrame, k: Int): DataFrame = {
    val seedW = Window.orderBy(col("id"))
    scaled.orderBy(col("id")).limit(k)
      .select((row_number().over(seedW) - 1).cast("long").as("cid"),
        col("xs").as("cs"))
  }

  /** Tie-break radix: `packed = dist · radix + cid` orders lexicographically
    * by (dist, cid) as long as cid < radix, so `min(packed)` is the exact
    * ORDER BY dist, cid argmin. */
  private val TieRadix = 1000000000L

  /** Per-round argmin as a TRUE hash aggregate — map-side combinable and
    * sort-free. The naive formulations both sort k× the corpus per round:
    * `row_number().over(Window.partitionBy(id))` plans a WindowExec
    * (shuffle + sort), and `min_by(cid, struct(dist, cid))` falls back to
    * SortAggregate because a struct ordering is not a mutable aggregation-
    * buffer type. Packing (dist, cid) into one fixed-precision decimal
    * keeps the buffer primitive-mutable, so Spark plans HashAggregateExec:
    * each task reduces its local N×k rows to one per id BEFORE the shuffle,
    * and nothing is sorted. dist ≤ dim·(2·scale·|v|max)² can exceed a
    * packed long for large scales, so the packing is DECIMAL(20,0)·radix +
    * cid = DECIMAL(32,0) — exact, and still a mutable buffer type.
    * Returns (id, cid). */
  private def assignIds(scaled: DataFrame, cents: DataFrame): DataFrame =
    scaled.crossJoin(broadcast(cents))
      .withColumn("dist", expr(
        "aggregate(zip_with(xs, cs, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("packed",
        expr(s"CAST(dist AS DECIMAL(20,0)) * $TieRadix + cid"))
      .groupBy(col("id"))
      .agg(min(col("packed")).as("p"))
      .select(col("id"), expr(s"CAST(p % $TieRadix AS BIGINT)").as("cid"))

  /** `iters` rounds of [assign → recompute centroids], then a final
    * assignment under the last centroids. Returns `(id, cluster)` with
    * cluster in 0..k-1 (centroid rank order). */
  def assign(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k, $iters")
    require(k < TieRadix, s"k must be < $TieRadix for the argmin packing")
    // hash-partition on id ONCE and cache: the per-round argmin aggregate's
    // clustering requirement is then already satisfied (no Exchange), and
    // the per-round xs re-join sees both sides co-partitioned on id
    val scaled = scaledVectors(emb, idCol, vecCol, scale)
      .repartition(col("id")).cache()

    var centroids = seedCentroids(scaled, k)

    for (i <- 0 until iters) {
      // centroid recompute needs each row's xs next to its assigned cid:
      // re-join the (id, cid) argmin result with the cached co-partitioned
      // vectors — shuffle-free on both sides (same hashpartitioning(id))
      val a = scaled.join(assignIds(scaled, centroids), "id")
      // integer centroid mean with FLOOR semantics (DuckDB's `//`): Spark's
      // `div` truncates toward zero, which differs on negative sums, so the
      // floor is taken through an exact double division (|sum| ≪ 2^52 and
      // a non-integral quotient is ≥ 1/n away from an integer — no
      // boundary-crossing rounding is possible)
      centroids = a
        .select(col("cid"), posexplode(col("xs")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("v",
          expr("CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT)"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, v))), p -> p.v)")
          .as("cs"))
      // truncate lineage every couple of rounds: each level nests a
      // crossJoin + window + two aggregations, and unchecked nesting blows
      // up driver planning time (the centroid frame is k rows — the
      // checkpoint is cheap)
      if ((i + 1) % 2 == 0 && i != iters - 1)
        centroids = centroids.localCheckpoint()
    }
    val result = assignIds(scaled, centroids)
      .select(col("id"), col("cid").as("cluster"))
      .localCheckpoint()
    scaled.unpersist()
    result
  }
}
