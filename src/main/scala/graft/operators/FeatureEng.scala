package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tabular feature engineering for model-training pipelines. */
object FeatureEng {

  /** Leave-one-out target encoding of a categorical column: each row is
    * assigned the mean label of its category EXCLUDING the row itself —
    * the standard target-leakage guard for encoding high-cardinality
    * categoricals. NULL for singleton categories (no other rows to
    * average).
    *
    * Plan shape: labels integerize to `1/scale` units (exact longs — the
    * category sums are order-free), ONE map-side-combined groupBy(cat)
    * for (Σ, n), joined back broadcast (one row per category; pass
    * `broadcastStats = false` when the category space itself is huge and
    * the join should stay key-partitioned). Per-row math is
    * `(Σ − own)/(n − 1)/scale` — two exact-input divisions, bit-identical
    * cross-engine.
    *
    * Output: input columns + `enc` (rounded at 6 decimals).
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: String,
      scale: Long = 1000000L, broadcastStats: Boolean = true): DataFrame = {
    val li = round(col(labelCol) * scale.toDouble).cast("long")
    val t = df.withColumn("__li", li)
    val g = t.groupBy(col(catCol)).agg(sum(col("__li")).as("__s"),
      count(lit(1)).as("__n"))
    t.join(if (broadcastStats) broadcast(g) else g, Seq(catCol))
      .withColumn("enc",
        when(col("__n") > 1,
          round((col("__s") - col("__li")).cast("double") /
            (col("__n") - 1) / scale.toDouble, 6)))
      .drop("__li", "__s", "__n")
  }

  /** Population-stability-index drift between two slices of a numeric
    * column (baseline vs current — the distribution-shift monitor run
    * between corpus snapshots before retraining):
    * `PSI = Σ_bins (p_b − q_b) · ln(p_b/q_b)` over `bins` equal-width
    * buckets of [lo, hi) (outliers clamp into the edge buckets), with
    * add-one smoothing so empty buckets stay finite. Counts are exact
    * integers, each bucket's shares are single divisions, and the per-
    * bucket terms integerize to micro-nats before the final sum — the
    * engine's standard order-free determinism contract. Rule of thumb:
    * PSI < 0.1 stable, > 0.25 shifted.
    *
    * Output: (grp, psi_micro) — one row per group; the whole reduction is
    * two bounded aggregates (groups × bins, then groups), nothing
    * proportional to row count past the first count.
    */
  def psiDrift(df: DataFrame, grpCol: String, valCol: String,
      curCol: String, bins: Int, lo: Double, hi: Double): DataFrame = {
    val width = (hi - lo) / bins
    val bucket = least(lit(bins - 1), greatest(lit(0),
      floor((col(valCol) - lo) / width))).cast("long")
    val cnts = df.select(col(grpCol).as("grp"), bucket.as("bucket"),
        col(curCol).cast("boolean").as("cur"))
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(when(col("cur"), 0L).otherwise(1L)).as("cp"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("cq"))
    val tot = cnts.groupBy(col("grp"))
      .agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
    // smoothed shares: (c + 1)/(n + bins) — exact-integer rationals; the
    // missing buckets' smoothed mass contributes ZERO to PSI ((p-q) = 0
    // when both sides are empty... only for buckets absent from BOTH
    // sides, where p = q = 1/(n+bins) only if np = nq. Emit all `bins`
    // buckets per group instead so absence is explicit.
    val grid = tot.select(col("grp"), col("np"), col("nq"),
      explode(sequence(lit(0L), lit((bins - 1).toLong))).as("bucket"))
    val p = (coalesce(col("cp"), lit(0L)) + 1).cast("double") / (col("np") + bins)
    val q = (coalesce(col("cq"), lit(0L)) + 1).cast("double") / (col("nq") + bins)
    grid.join(cnts, Seq("grp", "bucket"), "left")
      .select(col("grp"),
        round((p - q) * log(p / q) * 1e6).cast("long").as("term"))
      .groupBy(col("grp")).agg(sum(col("term")).as("psi_micro"))
  }

  /** Quantile normalization across groups: each row's value is replaced
    * by the POOLED distribution's value at the same within-group
    * quantile, so every group ends up on one common distribution — the
    * cross-source score-calibration step (a quality model trained on one
    * source reads differently on another; rank-mapping removes the
    * per-source scale). All rank arithmetic is integer:
    * pooled index = ceil(rn·N/n) = (rn·N + n − 1) div n over (value,
    * rowKey) total orders, and the mapped value is an exact data value —
    * no interpolation. The pooled reference rank is a
    * [[graft.operators.GlobalRank]] sharded pass (broadcast quantile-cut
    * boundaries + per-shard windows), parallel at any row count; the
    * total row count rides the same offset aggregate, saving the old
    * separate `count()` job. Output: (rk, grp, v, norm).
    */
  def quantileNormalize(df: DataFrame, grpCol: String, valCol: String,
      rowKey: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(rowKey).as("rk"), col(grpCol).as("grp"),
      col(valCol).cast("long").as("v"))
    val ranked = base
      .withColumn("rn", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("v").asc, col("rk").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val (pooledRanked, total) = graft.operators.GlobalRank.withRowNumber(
      base.select(col("v").as("pv"), col("rk")),
      col("pv"), asc = true, col("rk"), "idx")
    val pooled = pooledRanked.select(col("idx"), col("pv"))
    ranked
      .withColumn("idx", expr(s"(rn * ${total}L + n - 1) div n"))
      .join(pooled, Seq("idx"))
      .select(col("rk"), col("grp"), col("v"), col("pv").as("norm"))
  }

  /** Jensen-Shannon divergence between two slices' CATEGORICAL
    * distributions — the bounded, symmetric drift monitor that
    * complements [[psiDrift]] (PSI needs a numeric domain + binning; JSD
    * reads any category column and never goes infinite on empty cells).
    *
    * Exact-arithmetic form: with per-category counts a_c (slice A,
    * total n_a) and b_c,
    * `p_c/m_c = 2·a_c·n_b / (a_c·n_b + b_c·n_a)` — an exact integer
    * rational — so JSD = ½·Σ p_c·ln(p_c/m_c) + ½·Σ q_c·ln(q_c/m_c)
    * needs ONE mirrored ln per distinct category per side, integerized
    * to micro-nats BEFORE the count-weighted sums (the engine's
    * order-free discipline); the two closing divisions by 2n ride exact
    * longs. Absent categories contribute exactly 0 (their p_c = 0 side)
    * — guarded, never NaN. Bounded in [0, ln 2 ≈ 693147 micro].
    *
    * Plan: one aggregate per slice to category grain, one full outer
    * join of the two (category-grain), two 1-row totals broadcast, one
    * final 1-row aggregate. Output: (n_a, n_b, n_cats, jsd_micro).
    */
  def jsDivergence(dfA: DataFrame, dfB: DataFrame,
      catCol: String): DataFrame = {
    def cnts(df: DataFrame, out: String): DataFrame =
      df.select(coalesce(col(catCol).cast("string"), lit("\u0001"))
          .as("cat"))
        .groupBy(col("cat")).agg(count(lit(1)).as(out))
    val joined = cnts(dfA, "a").join(cnts(dfB, "b"), Seq("cat"), "full")
      .select(col("cat"), coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
    val tot = joined.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
    joined.crossJoin(broadcast(tot))
      .withColumn("ta", expr(
        """CASE WHEN a = 0 THEN 0L ELSE a * CAST(round(ln(
          |  2.0 * CAST(a AS DOUBLE) * n_b
          |  / (CAST(a AS DOUBLE) * n_b + CAST(b AS DOUBLE) * n_a))
          |  * 1000000.0) AS BIGINT) END""".stripMargin))
      .withColumn("tb", expr(
        """CASE WHEN b = 0 THEN 0L ELSE b * CAST(round(ln(
          |  2.0 * CAST(b AS DOUBLE) * n_a
          |  / (CAST(a AS DOUBLE) * n_b + CAST(b AS DOUBLE) * n_a))
          |  * 1000000.0) AS BIGINT) END""".stripMargin))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("n_cats"), sum(col("ta")).as("sa"),
        sum(col("tb")).as("sb"))
      .select(col("n_a"), col("n_b"), col("n_cats"), expr(
        """CAST(round(CAST(sa AS DOUBLE) / (2.0 * n_a)
          |  + CAST(sb AS DOUBLE) / (2.0 * n_b)) AS BIGINT)"""
          .stripMargin).as("jsd_micro"))
  }
}
