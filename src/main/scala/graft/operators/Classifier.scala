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

  /** Reliability diagram for the trained classifier: scored rows bucketed
    * into `bins` equal-width score bands, each with its count, positive
    * count, and exact micro-integer score sum — the observed-vs-predicted
    * readout that says whether the quality filter's scores can be used as
    * probabilities (threshold-picking needs this, not just accuracy).
    * All-integer cells; the two divisions (observed rate, mean score) run
    * on exact inputs. Output: (bin, n, n_pos, obs_rate, mean_score).
    */
  def calibration(feat: DataFrame, xs: Seq[String], steps: Int,
      lr: Double = 0.25, bins: Int = 10): DataFrame =
    fitPredict(feat, xs, steps, lr)
      .withColumn("bin",
        least(floor(col("score") * bins), lit(bins - 1)).cast("long"))
      .withColumn("sm", round(col("score") * 1e6).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("label").cast("long")).as("n_pos"),
        sum(col("sm")).as("ssm"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("obs_rate"),
        round(col("ssm").cast("double") / col("n") / 1e6, 6).as("mean_score"))

  /** The same weights trajectory as SQL CTEs for the DuckDB oracle:
    * `featSql` must yield the identical feature frame (same column names),
    * and the emitted text reproduces gradStep/fitPredict arithmetic
    * expression-for-expression. */
  def oracleSql(featSql: String, xs: Seq[String], steps: Int,
      lr: Double, selectCols: String): String = {
    val zf = dot(xs, s"w$steps")
    s"""${trajectoryCtes(featSql, xs, steps, lr)}
       |SELECT $selectCols, round(${sigma(zf)}, 6) AS score,
       |       ${sigma(zf)} >= 0.5 AS pred
       |FROM feat, w$steps""".stripMargin
  }

  /** DuckDB replica of [[calibration]]: same trajectory CTEs, final
    * select bins the scored rows. */
  def calibrationOracleSql(featSql: String, xs: Seq[String], steps: Int,
      lr: Double, bins: Int): String = {
    val zf = dot(xs, s"w$steps")
    s"""${trajectoryCtes(featSql, xs, steps, lr)},
       |scored AS (SELECT label, round(${sigma(zf)}, 6) AS score
       |           FROM feat, w$steps),
       |cells AS (SELECT least(CAST(floor(score * $bins) AS BIGINT),
       |                       ${bins - 1}) AS bin,
       |                 CAST(label AS BIGINT) AS lab,
       |                 CAST(round(score * 1e6) AS BIGINT) AS sm
       |          FROM scored)
       |SELECT bin, count(*) AS n, CAST(sum(lab) AS BIGINT) AS n_pos,
       |       round(CAST(sum(lab) AS DOUBLE) / count(*), 6) AS obs_rate,
       |       round(CAST(sum(sm) AS DOUBLE) / count(*) / 1e6, 6)
       |         AS mean_score
       |FROM cells GROUP BY 1""".stripMargin
  }

  /** Confusion-matrix + proper-scoring readout for the trained
    * classifier, one row: count, the four confusion cells, Matthews
    * correlation (the balance-robust single-number accuracy — NULL when
    * any margin is empty), the Brier score (mean squared probability
    * error — the PROPER score a quality filter should be tuned on), and
    * the expected calibration error over `bins` equal-width bands.
    *
    * Exactness: cells are exact long counts; the Brier sum accumulates
    * per-row `(sm − 10⁶·label)²` integers in DECIMAL(38,0) (1e12 per row
    * wraps a long past ~10⁷ rows); ECE reduces to the exact integer
    * identity `Σ_b |10⁶·n_pos_b − Σsm_b| / (10⁶·N)` — each band's
    * |observed − mean-score| gap times its weight clears every division.
    * The three closing expressions are single mirrored doubles
    * (micro-rounded at scale 0). MCC's four-margin product overflows
    * 2⁶³ at corpus scale, so it multiplies as doubles under the sqrt.
    * Output: (n, tp, fp, fn, tn, mcc_micro, brier_micro, ece_micro). */
  def evalMetrics(feat: DataFrame, xs: Seq[String], steps: Int,
      lr: Double = 0.25, bins: Int = 10): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val scored = fitPredict(feat, xs, steps, lr)
      .select(col("label").cast("long").as("lab"),
        col("pred").cast("long").as("pr"),
        round(col("score") * 1e6).cast("long").as("sm"),
        least(floor(col("score") * bins), lit(bins - 1)).cast("long")
          .as("bin"))
      .persist()
    val conf = scored.agg(count(lit(1)).as("n"),
      sum(when(col("lab") === 1L && col("pr") === 1L, 1L).otherwise(0L))
        .as("tp"),
      sum(when(col("lab") === 0L && col("pr") === 1L, 1L).otherwise(0L))
        .as("fp"),
      sum(when(col("lab") === 1L && col("pr") === 0L, 1L).otherwise(0L))
        .as("fn"),
      sum(when(col("lab") === 0L && col("pr") === 0L, 1L).otherwise(0L))
        .as("tn"),
      coalesce(sum(((col("sm") - col("lab") * 1000000L).cast(dec)
        * (col("sm") - col("lab") * 1000000L))),
        lit(BigDecimal(0)).cast(dec)).as("bsum"))
    val ece = scored.groupBy(col("bin"))
      .agg(sum(col("lab")).as("npos"), sum(col("sm")).as("ssm"))
      .agg(coalesce(sum(abs(col("npos") * 1000000L - col("ssm"))), lit(0L))
        .as("egap"))
    val out = conf.crossJoin(broadcast(ece))
      .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"), expr(
        """CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
          |    OR tn + fn = 0 THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(round(1e6
          |    * (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
          |    / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
          |        * (tn + fp) * (tn + fn))) AS BIGINT)
          |  END""".stripMargin).as("mcc_micro"),
        expr("""CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)
          |ELSE CAST(round(CAST(bsum AS DOUBLE) / (1e6 * n)) AS BIGINT)
          |END""".stripMargin).as("brier_micro"),
        expr("""CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)
          |ELSE CAST(round(CAST(egap AS DOUBLE) / n) AS BIGINT)
          |END""".stripMargin).as("ece_micro"))
      .persist()
    out.count()
    scored.unpersist(false)
    out
  }

  /** DuckDB replica of [[evalMetrics]]: same trajectory CTEs, same
    * integer identities. */
  def evalMetricsOracleSql(featSql: String, xs: Seq[String], steps: Int,
      lr: Double, bins: Int): String = {
    val zf = dot(xs, s"w$steps")
    s"""${trajectoryCtes(featSql, xs, steps, lr)},
       |scored AS (SELECT CAST(label AS BIGINT) AS lab,
       |    CAST(${sigma(zf)} >= 0.5 AS BIGINT) AS pr,
       |    CAST(round(round(${sigma(zf)}, 6) * 1e6) AS BIGINT) AS sm,
       |    least(CAST(floor(round(${sigma(zf)}, 6) * $bins) AS BIGINT),
       |      ${bins - 1}) AS bin
       |  FROM feat, w$steps),
       |conf AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN lab = 1 AND pr = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN lab = 0 AND pr = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN lab = 1 AND pr = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN lab = 0 AND pr = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tn,
       |    coalesce(sum(CAST((sm - lab * 1000000) AS HUGEINT)
       |      * (sm - lab * 1000000)), 0) AS bsum
       |  FROM scored),
       |eceb AS (SELECT bin, CAST(sum(lab) AS BIGINT) AS npos,
       |    CAST(sum(sm) AS BIGINT) AS ssm
       |  FROM scored GROUP BY 1),
       |ece AS (SELECT CAST(coalesce(sum(abs(npos * 1000000 - ssm)), 0)
       |    AS BIGINT) AS egap FROM eceb)
       |SELECT n, tp, fp, fn, tn,
       |  CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
       |      OR tn + fn = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE CAST(round(1e6
       |      * (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
       |      / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
       |          * (tn + fp) * (tn + fn))) AS BIGINT)
       |    END AS mcc_micro,
       |  CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE CAST(round(CAST(bsum AS DOUBLE) / (1e6 * n)) AS BIGINT)
       |    END AS brier_micro,
       |  CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE CAST(round(CAST(egap AS DOUBLE) / n) AS BIGINT)
       |    END AS ece_micro
       |FROM conf CROSS JOIN ece""".stripMargin
  }

  private def dot(xs: Seq[String], wPrefix: String): String =
    xs.zipWithIndex.map { case (c, j) => s"$c * ${wPrefix}_$j" }
      .mkString("(", " + ", ")")

  private def sigma(z: String): String =
    s"(0.5 + $z / (2.0 * (1.0 + abs($z))))"

  /** The weight-trajectory CTE chain shared by every oracle form. */
  private def trajectoryCtes(featSql: String, xs: Seq[String], steps: Int,
      lr: Double): String = {
    val w0 = xs.indices.map(j => s"0.0 AS w0_$j").mkString(", ")
    val stepCtes = (1 to steps).map { k =>
      val z = dot(xs, s"w${k - 1}")
      val sums = xs.zipWithIndex.map { case (c, j) =>
        s"w${k - 1}_$j + $lr * (sum(CAST(round($c * (label - ${sigma(z)}) * 1e9) AS BIGINT))::DOUBLE / (n_rows * 1e9)) AS w${k}_$j"
      }.mkString(", ")
      s"w$k AS (SELECT ${sums} FROM feat, w${k - 1}, nrows GROUP BY ${
        xs.indices.map(j => s"w${k - 1}_$j").mkString(", ")}, n_rows)"
    }
    s"""WITH feat AS ($featSql),
       |nrows AS (SELECT count(*) AS n_rows FROM feat),
       |w0 AS (SELECT $w0),
       |${stepCtes.mkString(",\n")}""".stripMargin
  }
}
