package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TypedAggregators

/** Remaining query-surface coverage: user-defined typed aggregation (UDAF),
  * exact percentiles, sketch aggregates, pivot. */
object Advanced {
  import Tables.t

  def defs: Seq[Q] = Seq(
    // typed Aggregator through the untyped UDAF surface; math mirrors in SQL
    Q("q28_typed_agg", (s, d) => {
      val sumsq = udaf(TypedAggregators.SumOfSquares)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("rflag"))
        .agg(round(sumsq(col("l_quantity")), 2).as("sum_qty_sq"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT l_returnflag AS rflag,
             round(sum(l_quantity * l_quantity), 2) AS sum_qty_sq,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag""")),

    // exact median over integer-scaled values: midpoint interpolation is
    // exact (x.0 / x.5), so engines agree bit-for-bit after x10 scaling
    Q("q29_percentile", (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus").as("lstatus"))
        .agg(
          expr("CAST(percentile(CAST(l_quantity * 100 AS BIGINT), 0.5D) * 10 AS BIGINT)")
            .as("median_qty_x1000"),
          expr("CAST(percentile(CAST(l_quantity * 100 AS BIGINT), 0.25D) * 10 AS BIGINT)")
            .as("p25_qty_x1000")),
      Some("""
        SELECT l_linestatus AS lstatus,
               CAST(quantile_cont(CAST(l_quantity * 100 AS BIGINT), 0.5) * 10 AS BIGINT) AS median_qty_x1000,
               CAST(quantile_cont(CAST(l_quantity * 100 AS BIGINT), 0.25) * 10 AS BIGINT) AS p25_qty_x1000
        FROM lineitem GROUP BY l_linestatus""")),

    // HLL++ estimates are implementation-specific, so the raw estimate can't
    // hash-match DuckDB; instead the query VERIFIES the sketch against the
    // exact count — the estimate must land within 5x the configured rsd
    // (0.02), a bound HLL++ satisfies deterministically on fixed data. The
    // boolean + exact count are engine-independent and hash-checkable.
    // plan note: HLL is duplicate-insensitive, so pre-distincting the
    // (flag, part) pairs first feeds BOTH aggregates from one hash shuffle —
    // exact count becomes a plain count and no Expand is needed
    Q("q30_approx_distinct", (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag").as("rflag"), col("l_partkey"))
        .distinct()
        .groupBy(col("rflag"))
        .agg(count(lit(1)).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .select(col("rflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")) <=
            col("exact_parts") * 0.10).as("approx_within_tol")),
      Some("""
        SELECT l_returnflag AS rflag,
               count(DISTINCT l_partkey) AS exact_parts,
               true AS approx_within_tol
        FROM lineitem GROUP BY 1""")),

    // event-time tumbling window as a batch aggregation — the same
    // window() operator Structured Streaming uses, epoch-aligned, so the
    // oracle is DuckDB's time_bucket
    Q("q35_tumbling_window", (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value")),
      Some("""
        SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
               event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2""")),

    // streaming-vs-batch equivalence: the SAME tumbling-window aggregation
    // as q35, but executed by Structured Streaming (parquet file source,
    // AvailableNow trigger, memory sink, complete mode) — the incremental
    // engine must produce byte-identical results to the batch plan, checked
    // against the identical DuckDB oracle. Complete mode because a finite
    // replay's final window never crosses the watermark in append mode.
    Q("q49_stream_batch_parity", (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = Tables.eventsStream(s, d)
      val q = graft.streaming.WindowedAgg
        .tumblingCounts(ev, "ts", "event_type", "6 hours", "1 hour")
        .writeStream.format("memory").queryName("q49_stream")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("q49_stream")
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("total_value"), 2).as("total_value"))
    }, Some("""
        SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
               event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2""")),

    // generator/table-function surface: one output row per input token
    Q("q32_posexplode", (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "token")
        .withColumn("pos", col("pos").cast("long")),
      Some("""
        SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
               i -> {'pos': i - 1, 'token': string_split(text, ' ')[i]}), recursive := true)
        FROM documents WHERE doc_id < 50""")),

    // pivot: one output column per o_orderstatus value
    Q("q31_pivot", (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(col("o_totalprice")), 2)),
      Some("""
        SELECT o_orderpriority AS priority,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        FROM orders GROUP BY o_orderpriority""")))
}
