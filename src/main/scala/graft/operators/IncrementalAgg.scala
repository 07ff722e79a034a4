package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance via partial-aggregate state merge —
  * the materialized-rollup pattern: keep a small per-key state table
  * (count / sum / min / max over micro-integerized values), fold each new
  * partition's state in WITHOUT rescanning history, derive final metrics
  * (averages) only at read time. Spark's own partial aggregation does this
  * within one job; this operator makes the algebra durable ACROSS jobs, so
  * a daily 100 TB append costs one scan of the day, never of the corpus —
  * the same commutative-monoid discipline as
  * [[graft.operators.IncrementalDedup]]'s fingerprint index and the
  * incremental profile (q59c).
  *
  * Everything in state is an exact long (values integerized to micro at
  * ingest), so merge order cannot change any result and merged state is
  * bit-identical to a full recompute — which is exactly what the oracle
  * checks. Avg is NOT state (it doesn't merge); it derives from sum/cnt at
  * read time with one IEEE division.
  */
object IncrementalAgg {

  /** Aggregate `df` to per-`keyCols` partial state:
    * (keys..., cnt, sum_micro, min_micro, max_micro). One map-side-combined
    * aggregate — the only pass proportional to input size. */
  def state(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    df.select(keyCols.map(col) :+
        round(col(valCol) * 1e6).cast("long").as("__vm"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col("__vm")).as("sum_micro"),
        min(col("__vm")).as("min_micro"), max(col("__vm")).as("max_micro"))

  /** Merge any number of state tables into one — all columns merge by the
    * monoid op (cnt/sum add, min/max lattice), so the union re-aggregate
    * is key-grain-bounded work regardless of how much raw data the states
    * summarize. */
  def merge(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_micro")).as("sum_micro"),
        min(col("min_micro")).as("min_micro"),
        max(col("max_micro")).as("max_micro"))
  }

  /** Read-time projection of state to final metrics: adds `avg_micro`
    * (HALF_UP-rounded integer micro mean). */
  def readout(state: DataFrame): DataFrame =
    state.withColumn("avg_micro",
      expr("CAST(round(CAST(sum_micro AS DOUBLE) / cnt) AS BIGINT)"))
}
