package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs => H}

/** Weighted sampling without replacement via the Efraimidis–Spirakis
  * exponential race (A-ES): each row draws u ∈ (0,1] and the k rows with
  * the largest u^(1/w) win — one pass, no per-group state, and the top-k
  * reduces through `TakeOrdered` (per-partition heaps + a k-row driver
  * merge), never a global sort. The canonical way to draw a
  * quality-weighted training subset from a 100 TB corpus in one scan.
  *
  * Determinism contract: u derives from the shared char hash of the key
  * (no RNG state), and ordering uses ln(u) integerized to micro-nats
  * (`round(ln(u)·1e6)`) divided by the integer weight — one
  * exact-input IEEE division, mirrored term-for-term by the DuckDB
  * oracle, the same integerize-before-compare discipline as the LM
  * perplexity and Kaplan–Meier operators.
  */
object Sampling {

  /** The race key ln(u)/w as a Column expression over `keyCol` (string
    * SQL expression) and `wCol` (positive integer weight). Larger is
    * better (ln(u) ≤ 0: key closest to 0 ⇔ largest u^(1/w)). */
  private def raceKey(keyExpr: String, wCol: String): Column = {
    val h = H.sparkCharHash(keyExpr)
    val u = s"(($h) + 1.0) / (${H.P} + 1.0)"
    expr(s"CAST(round(ln($u) * 1e6) AS BIGINT) / CAST($wCol AS DOUBLE)")
  }

  /** Draw `k` rows weighted by `wCol` (positive integer), without
    * replacement. Returns the winning rows' key and weight, plus the
    * integer micro-nat numerator (exposed so the selection is auditable);
    * ties break on the key. */
  def weightedSample(df: DataFrame, keyCol: String, wCol: String,
      k: Int): DataFrame =
    // w ≤ 0 rows are unsampleable by definition (u^(1/w) undefined) and
    // would divide by zero under ANSI — excluded up front, mirroring the
    // A-ES semantics rather than erroring
    df.filter(col(wCol) > 0)
      .select(col(keyCol), col(wCol),
        raceKey(s"CAST($keyCol AS STRING)", wCol).as("race"))
      .orderBy(col("race").desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), col(wCol))

  /** DuckDB replica of [[weightedSample]]'s race key over `keyExpr`
    * (VARCHAR expression) and integer `wCol`. */
  def duckRaceKey(keyExpr: String, wCol: String): String = {
    val h = H.duckCharHash(keyExpr)
    val u = s"(($h) + 1.0) / (${H.P} + 1.0)"
    s"CAST(round(ln($u) * 1e6) AS BIGINT) / CAST($wCol AS DOUBLE)"
  }

  /** Diversity sampling: cluster the embedding space with the exact
    * integer k-means ([[KMeans.assign]]) and keep `perCluster` members of
    * EACH cluster, chosen in deterministic hash order (Knuth-mix of the
    * id — reproduces on any partitioning, like [[weightedSample]]'s
    * race). The standard "cover the distribution, don't oversample the
    * head" subset draw of corpus curation: uniform sampling follows
    * density, this follows STRUCTURE — tail clusters keep representation
    * at any sampling rate.
    *
    * Scale shape: the k-means rounds dominate (corpus-linear per round);
    * the quota pick is one window rank per cluster, co-partitioned on the
    * cluster key. Output: (id, cluster) for kept rows. */
  def diverseSample(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, perCluster: Int): DataFrame = {
    require(perCluster > 0, s"perCluster must be > 0, got $perCluster")
    import org.apache.spark.sql.expressions.Window
    val asg = KMeans.assign(emb, idCol, vecCol, k, iters)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("__ord").asc, col("id").asc)
    // id reduced mod P BEFORE the Knuth multiply: (P-1)·2654435761 ≈
    // 2.7e18 stays in long range, where a raw big id would wrap silently
    // in Spark and THROW in the DuckDB oracle
    val out = asg
      .withColumn("__ord", expr(s"((id % ${H.P}) * 2654435761) % ${H.P}"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perCluster)
      .select(col("id"), col("cluster"))
      .persist()
    out.count()
    Checkpoints.release(asg)
    out
  }

  /** Temperature-scaled multi-source sampling (the multilingual-LM mix
    * rule): a source with n docs gets quota ∝ n^α, α = 1/2 — low-resource
    * groups are upsampled relative to their share, the head is damped.
    * α fixed at 1/2 because √n is the ONE power IEEE 754 computes
    * correctly rounded (`sqrt`); arbitrary α via exp/ln would leave the
    * engines one ULP apart and break the oracle hash.
    *
    * Determinism: per-group weight r = round(√n · 1e6) is a single exact
    * BIGINT; the weight total and quota = round(total · r / R) are one
    * exact sum and one IEEE division — no float accumulation anywhere.
    * Members are then picked per group in content-hash order (same
    * rank-by-hash race as [[weightedSample]], tie on id), so the draw
    * reproduces on any partitioning and is stable under corpus appends
    * that don't change group counts.
    *
    * Plan shape: one count aggregate to group grain (bounded), quota rides
    * back on a broadcast join, one group-partitioned window rank. The
    * window partitions on the GROUP key — fine while every group fits a
    * task (quota sampling over million-member groups should pre-filter by
    * hash threshold first; the rank is only needed for the exact-quota
    * boundary). Output: (id, grp) for kept rows.
    */
  def temperatureSample(df: DataFrame, grpCol: String, idCol: String,
      total: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r",
        expr("CAST(round(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)"))
    val quotas = counts
      .crossJoin(broadcast(counts.agg(sum(col("r")).as("rt"))))
      .select(col("grp"),
        expr(s"CAST(round($total * CAST(r AS DOUBLE) / rt) AS BIGINT)")
          .as("quota"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("__ord").asc, col("id").asc)
    df.select(col(idCol).as("id"), col(grpCol).as("grp"))
      .join(broadcast(quotas), Seq("grp"))
      .withColumn("__ord", expr(s"((id % ${H.P}) * 2654435761) % ${H.P}"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("quota"))
      .select(col("id"), col("grp"))
  }
}
