package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — the churn/retention
  * curve estimator behind "how long do users stay active" questions on
  * event logs.
  *
  * The Kaplan-Meier estimator S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) is a cumulative
  * PRODUCT, which would be reduction-order-sensitive in floating point; the
  * engine stores the curve in log space as EXACT integers instead: each
  * step's cost round(−ln(1 − dᵢ/nᵢ)·1e9) is a long (the ln runs on an
  * exact rational of two integers — identical in every engine), and the
  * curve is their windowed cumulative SUM, exact at any order. Consumers
  * recover S(t) = exp(−cum_nats/1e9) losslessly at display time.
  *
  * Plan shape: one groupBy(duration) for the risk table (bounded by
  * distinct durations, not subjects), the subject total riding the plan as
  * a broadcast 1-row aggregate, one ordered window over the risk table —
  * nothing proportional to subject count past the first aggregate.
  */
object Survival {

  /** Kaplan-Meier over `(durCol, obsCol)` rows — duration in integer
    * units, `obsCol` 1 = event observed (churned), 0 = right-censored
    * (still active at horizon). Returns one row per duration with ≥1
    * event: (t, n_risk, n_event, cum_nats). A step where EVERY remaining
    * subject exits (d = n_risk, S hits exact zero, infinite nats) carries
    * a NULL cost that the running sum skips — downstream reads S = 0 from
    * that point. */
  def kaplanMeier(df: DataFrame, durCol: String, obsCol: String): DataFrame = {
    val subj = df.select(col(durCol).as("t"), col(obsCol).as("obs"))
    val total = subj.agg(count(lit(1)).as("n"))
    val byT = subj.groupBy(col("t"))
      .agg(sum(col("obs")).as("d"), count(lit(1)).as("c"))
    // duration-grain risk table (days/weeks — a survival curve's step
    // count is display-bounded); explicit single-partition key so the
    // WindowExec warning channel stays reserved for unintended
    // corpus-grain windows (see GlobalRank.boundedKey)
    val before = Window.partitionBy(GlobalRank.boundedKey(col("t")))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.partitionBy(GlobalRank.boundedKey(col("t")))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("left_before",
        coalesce(sum(col("c")).over(before), lit(0L)))
      .crossJoin(broadcast(total))
      .filter(col("d") > 0)
      .withColumn("n_risk", col("n") - col("left_before"))
      .withColumn("cost",
        when(col("d") < col("n_risk"),
          round(-log(lit(1.0) - col("d").cast("double") / col("n_risk")) * 1e9)
            .cast("long")))
      .withColumn("cum_nats", sum(col("cost")).over(cum))
      .select(col("t"), col("n_risk"), col("d").as("n_event"),
        col("cum_nats"))
  }

  /** Nelson-Aalen cumulative hazard over the same `(durCol, obsCol)`
    * contract as [[kaplanMeier]]: `H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ` — the
    * additive companion the hazard-RATE questions want (KM answers "what
    * fraction survives", NA answers "how much cumulative risk has
    * accrued", and at low event rates H ≈ −ln S so the two curves
    * cross-check each other). Each step's `round(1e9·dᵢ/nᵢ)` is
    * nano-rounded THEN summed (exact longs at any step count — the same
    * log-space discipline as KM's nats). Same duration-grain plan: one
    * groupBy(duration), one broadcast total, one ordered window. Output:
    * (t, n_risk, n_event, cum_hazard_nano). */
  def nelsonAalen(df: DataFrame, durCol: String, obsCol: String): DataFrame = {
    val subj = df.select(col(durCol).as("t"), col(obsCol).as("obs"))
    val total = subj.agg(count(lit(1)).as("n"))
    val byT = subj.groupBy(col("t"))
      .agg(sum(col("obs")).as("d"), count(lit(1)).as("c"))
    val before = Window.partitionBy(GlobalRank.boundedKey(col("t")))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.partitionBy(GlobalRank.boundedKey(col("t")))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("left_before",
        coalesce(sum(col("c")).over(before), lit(0L)))
      .crossJoin(broadcast(total))
      .filter(col("d") > 0)
      .withColumn("n_risk", col("n") - col("left_before"))
      .withColumn("h_nano",
        round(col("d").cast("double") / col("n_risk") * 1e9).cast("long"))
      .withColumn("cum_hazard_nano", sum(col("h_nano")).over(cum))
      .select(col("t"), col("n_risk"), col("d").as("n_event"),
        col("cum_hazard_nano"))
  }

  /** Two-sample log-rank test: do cohorts A and B share a survival
    * curve? — the inference closer over the [[kaplanMeier]] risk-table
    * machinery (eyeballing two KM curves is not a test; this is). At
    * every pooled event time, cohort A's observed events compare to the
    * hypergeometric expectation `d_t·n_At/n_t` with variance
    * `d_t·n_At·(n_t−n_At)·(n_t−d_t)/(n_t²(n_t−1))`; each time's
    * expectation/variance term is nano-rounded THEN summed (exact longs
    * — the chiSquare per-cell discipline), observed events stay exact,
    * and `χ² = (O_A − E_A)²/V` is the one closing mirrored double.
    * Time-grain plan: one groupBy(duration) carrying per-cohort event
    * and at-risk tallies, ONE ordered window for both cumulative exits,
    * a broadcast 1-row total — nothing subject-grain past the first
    * aggregate. Degenerates: V = 0 (every event time trivial) or an
    * empty cohort → NULL χ². Output: one row (n_a, n_b, n_times, o_a,
    * e_a_nano, v_nano, chi2_micro). */
  def logRank(df: DataFrame, grpCol: String, durCol: String,
      obsCol: String, groupA: String, groupB: String): DataFrame = {
    val subj = df.filter(col(grpCol).isin(groupA, groupB))
      .select((col(grpCol) === groupA).as("isa"), col(durCol).as("t"),
        col(obsCol).cast("long").as("obs"))
    val total = subj.agg(
      coalesce(sum(when(col("isa"), 1L).otherwise(0L)), lit(0L)).as("n1"),
      count(lit(1)).as("n"))
    val byT = subj.groupBy(col("t"))
      .agg(sum(when(col("isa"), col("obs")).otherwise(0L)).as("d1"),
        sum(col("obs")).as("dt"),
        sum(when(col("isa"), 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("ct"))
    val before = Window.partitionBy(GlobalRank.boundedKey(col("t")))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("left1", coalesce(sum(col("c1")).over(before), lit(0L)))
      .withColumn("leftt", coalesce(sum(col("ct")).over(before), lit(0L)))
      .crossJoin(broadcast(total))
      .filter(col("dt") > 0)
      .withColumn("n1t", col("n1") - col("left1"))
      .withColumn("nt", col("n") - col("leftt"))
      .withColumn("e_nano", expr(
        "CAST(round(1e9 * CAST(dt AS DOUBLE) * n1t / nt) AS BIGINT)"))
      .withColumn("v_nano", expr(
        """CASE WHEN nt <= 1 THEN 0L
          |ELSE CAST(round(1e9 * CAST(dt AS DOUBLE) * n1t * (nt - n1t)
          |    * (nt - dt)
          |  / (CAST(nt AS DOUBLE) * nt * (nt - 1))) AS BIGINT)
          |END""".stripMargin))
      .agg(max(col("n1")).as("n_a"), (max(col("n")) - max(col("n1")))
          .as("n_b"),
        count(lit(1)).as("n_times"),
        coalesce(sum(col("d1")), lit(0L)).as("o_a"),
        coalesce(sum(col("e_nano")), lit(0L)).as("e_a_nano"),
        coalesce(sum(col("v_nano")), lit(0L)).as("v_nano"))
      .select(col("n_a"), col("n_b"), col("n_times"), col("o_a"),
        col("e_a_nano"), col("v_nano"), expr(
        """CASE WHEN v_nano <= 0 THEN CAST(NULL AS BIGINT)
          |ELSE CAST(round(1e6
          |  * (CAST(o_a AS DOUBLE) - CAST(e_a_nano AS DOUBLE) / 1e9)
          |  * (CAST(o_a AS DOUBLE) - CAST(e_a_nano AS DOUBLE) / 1e9)
          |  / (CAST(v_nano AS DOUBLE) / 1e9)) AS BIGINT)
          |END""".stripMargin).as("chi2_micro"))
  }
}
