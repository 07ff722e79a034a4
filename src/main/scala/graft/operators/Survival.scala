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
}
