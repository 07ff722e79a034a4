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
  * row_number window partitioned by id for the argmin, and one
  * posexplode + groupBy(cid, dim) for the new means — no driver-side
  * vectors, no cartesian beyond the deliberate row×k assignment.
  *
  * Seeds are the k lowest-id vectors (deterministic, mirrors the IVF
  * seeding fixed in round 3 — rank-based, no dense-id assumption).
  */
object KMeans {

  /** `iters` rounds of [assign → recompute centroids], then a final
    * assignment under the last centroids. Returns `(id, cluster)` with
    * cluster in 0..k-1 (centroid rank order). */
  def assign(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k, $iters")
    val scaled = emb.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, v -> CAST(round(CAST(v AS DOUBLE) * $scale.0) AS BIGINT))")
        .as("xs")).cache()

    val seedW = Window.orderBy(col("id"))
    var centroids = scaled.orderBy(col("id")).limit(k)
      .select((row_number().over(seedW) - 1).cast("long").as("cid"),
        col("xs").as("cs"))

    def assignTo(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("dist").asc, col("cid").asc)
      scaled.crossJoin(broadcast(cents))
        .withColumn("dist", expr(
          "aggregate(zip_with(xs, cs, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("xs"), col("cid"))
    }

    for (i <- 0 until iters) {
      val a = assignTo(centroids)
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
    val result = assignTo(centroids)
      .select(col("id"), col("cid").as("cluster"))
      .localCheckpoint()
    scaled.unpersist()
    result
  }
}
