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
}
