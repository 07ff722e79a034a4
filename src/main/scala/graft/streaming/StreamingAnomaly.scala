package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-rate anomaly detection: windowed per-group counts on a
  * live stream z-scored against a batch-trained baseline (the
  * `TimeSeries.momentStats` moments of historical bucket counts).
  *
  * The train/score split is the production shape: the baseline is a tiny
  * static frame refreshed offline, broadcast to every task; the stream
  * only carries one count per (group, open window) of state — bounded by
  * the window domain and the watermark, never by event volume.
  *
  * The baseline joins BEFORE the windowed aggregation: Structured
  * Streaming supports stream-static equi-joins on the input side but not
  * joins below an aggregation's output, so the moments ride the groupBy
  * keys (constant within a group) and the post-aggregation projection is
  * pure scalar arithmetic. With an epoch-aligned tumbling window this is
  * hash-exact to the batch `TimeSeries.rateAnomaly` over the same events —
  * the parity the q88 oracle checks.
  */
object StreamingAnomaly {

  /** Score a streaming frame against `baseline` = (grp, mean, variance).
    * Output per closed/updated window: (grp, bin_us, cnt, z), z NULL for
    * zero-variance groups — identical shape and values to the batch
    * operator. Groups absent from the baseline are dropped (inner join):
    * a group with no history has no distribution to score against.
    */
  def score(stream: DataFrame, baseline: DataFrame, grpCol: String,
      tsCol: String, windowLen: String): DataFrame =
    stream.select(col(grpCol).as("grp"), col(tsCol).as("ts"))
      .join(broadcast(baseline), Seq("grp"))
      .groupBy(window(col("ts"), windowLen), col("grp"), col("mean"),
        col("variance"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("grp"), unix_micros(col("window.start")).as("bin_us"),
        col("cnt"),
        when(col("variance") > 0,
          round((col("cnt").cast("double") - col("mean")) / sqrt(col("variance")), 6))
          .as("z"))
}
