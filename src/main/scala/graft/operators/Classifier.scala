package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a tiny linear quality classifier — the
  * "learned quality filter" stage of a corpus pipeline (FastText-style
  * quality scoring reduced to its Spark-native skeleton): K fixed
  * full-batch gradient-descent steps, each ONE map-side-combined aggregate
  * over the corpus with the current weights broadcast as plan literals.
  *
  * This is the canonical cluster shape for batch GD: per-step cost is a
  * single narrow scan + d-value aggregate (no per-row driver traffic, no
  * parameter server needed at d = a handful), and the only driver collect
  * is the d+1-element gradient — a bounded control-plane aggregate like
  * k-means' centroid fold.
  *
  * Determinism contract (cross-engine hash-exactness vs the DuckDB
  * oracle): the link is the RATIONAL fast sigmoid σ̂(z) = 1/2 + z/(2(1+|z|))
  * — same sign/shape/asymptotes as the logistic, but built only from
  * IEEE-correctly-rounded ops (no exp/libm variance); per-row gradient
  * contributions are integerized to a 1e-9 grid as longs BEFORE summation
  * so aggregation order cannot change the result; weight updates divide the
  * exact integer gradient once (n·1e9 < 2^53 at any realistic n) and scale
  * by a power-of-two learning rate (exact). Every engine replaying the
  * same expressions therefore reproduces the weights bit-for-bit.
  */
object Classifier {

  /** Gradient of one GD step at weights `w` over features `xs` and 0/1
    * `label`, as exact integerized longs: Σ round(1e9 · x_j · (y − σ̂(w·x))).
    */
  private def gradStep(feat: DataFrame, xs: Seq[String], w: Array[Double]): Array[Long] = {
    // w·x with a FIXED left-to-right association — the oracle mirrors it
    val z = xs.zipWithIndex.map { case (c, j) => col(c) * lit(w(j)) }
      .reduceLeft(_ + _)
    val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    val resid = col("label") - p
    val sums = xs.map(c => sum(round(col(c) * resid * 1e9).cast("long")).as(c))
    val row = feat.agg(sums.head, sums.tail: _*).head()
    xs.indices.map(j => row.getLong(j)).toArray
  }

  /** Train `steps` full-batch GD steps from w = 0 with learning rate `lr`
    * (use a power of two), then score every row. `xs` are feature column
    * names (include a constant column for the intercept); `label` must be
    * 0.0/1.0. Returns (input columns…, score, pred) where score = σ̂(w·x)
    * rounded at 6 decimals.
    */
  def fitPredict(feat: DataFrame, xs: Seq[String], steps: Int,
      lr: Double = 0.25): DataFrame = {
    val n = feat.count()
    val w = Array.fill(xs.size)(0.0)
    for (_ <- 1 to steps) {
      val g = gradStep(feat, xs, w)
      // g_j/(n·1e9) is ONE division of exacts; ·lr (power of two) is exact
      for (j <- xs.indices) w(j) += lr * (g(j).toDouble / (n * 1e9))
    }
    val z = xs.zipWithIndex.map { case (c, j) => col(c) * lit(w(j)) }
      .reduceLeft(_ + _)
    val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    feat.withColumn("score", round(p, 6))
      .withColumn("pred", (p >= 0.5).cast("boolean"))
  }

  /** The same weights trajectory as SQL CTEs for the DuckDB oracle:
    * `featSql` must yield the identical feature frame (same column names),
    * and the emitted text reproduces gradStep/fitPredict arithmetic
    * expression-for-expression. */
  def oracleSql(featSql: String, xs: Seq[String], steps: Int,
      lr: Double, selectCols: String): String = {
    def dot(wPrefix: String) =
      xs.zipWithIndex.map { case (c, j) => s"$c * ${wPrefix}_$j" }
        .mkString("(", " + ", ")")
    def sigma(z: String) = s"(0.5 + $z / (2.0 * (1.0 + abs($z))))"
    val w0 = xs.indices.map(j => s"0.0 AS w0_$j").mkString(", ")
    val stepCtes = (1 to steps).map { k =>
      val z = dot(s"w${k - 1}")
      val sums = xs.zipWithIndex.map { case (c, j) =>
        s"w${k - 1}_$j + $lr * (sum(CAST(round($c * (label - ${sigma(z)}) * 1e9) AS BIGINT))::DOUBLE / (n_rows * 1e9)) AS w${k}_$j"
      }.mkString(", ")
      s"w$k AS (SELECT ${sums} FROM feat, w${k - 1}, nrows GROUP BY ${
        xs.indices.map(j => s"w${k - 1}_$j").mkString(", ")}, n_rows)"
    }
    val zf = dot(s"w$steps")
    s"""WITH feat AS ($featSql),
       |nrows AS (SELECT count(*) AS n_rows FROM feat),
       |w0 AS (SELECT $w0),
       |${stepCtes.mkString(",\n")}
       |SELECT $selectCols, round(${sigma(zf)}, 6) AS score,
       |       ${sigma(zf)} >= 0.5 AS pred
       |FROM feat, w$steps""".stripMargin
  }
}
