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
}
