package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Streaming heavy hitters with bounded global state.
  *
  * The batch sketch ([[graft.operators.Sketches.heavyHitters]]) answers
  * "which keys dominate" in one bounded-state pass; this is its unbounded-
  * stream counterpart. A naive streaming `groupBy(key).count` keeps one
  * state row PER DISTINCT KEY — at production cardinality (url, user_id)
  * that state grows with the stream and eventually evicts or OOMs. Here the
  * key space is hashed into `shards` groups and each shard maintains a
  * Misra-Gries summary of at most `capacity` counters, so total state is
  * `shards x capacity` counters FOREVER, regardless of key cardinality.
  *
  * Sharding keeps the two scale knobs independent: `shards` sets the
  * parallelism of state updates (each micro-batch updates shards
  * concurrently), `capacity` the memory/accuracy trade. Because a key
  * hashes to exactly one shard, shard summaries are disjoint and the
  * corpus-wide top-k is a concat + sort, never a merge of overlapping
  * estimates. Misra-Gries guarantees: any key with true count
  * > shardRows/capacity survives its shard's summary, and a surviving
  * estimate undercounts by at most shardRows/capacity. When a shard's
  * distinct-key count stays within `capacity` no decrement ever fires and
  * the counts are EXACT (the q74 oracle runs in that regime; the
  * estimation regime is recall-tested in `StreamingSpec`).
  */
object StreamingSketch {

  /** One shard's summary after a micro-batch: `processed` is the shard's
    * cumulative row count (monotone — the "latest summary wins" ordering
    * for Update-mode sinks), `items` the current Misra-Gries counters. */
  final case class ShardSummary(shard: Int, processed: Long,
      items: Map[String, Long])

  /** Internal Misra-Gries accumulator persisted in the state store
    * (public: codegen'd state (de)serializers construct it reflectively). */
  final case class MgState(processed: Long, items: Map[String, Long])

  /** Per-shard Misra-Gries over an unbounded stream: emits each shard's
    * refreshed summary every micro-batch (Update output mode). */
  def heavyHitters(df: DataFrame, keyExpr: String, shards: Int = 8,
      capacity: Int = 4096): Dataset[ShardSummary] = {
    require(shards > 0 && capacity > 0, "shards and capacity must be positive")
    implicit val out: Encoder[ShardSummary] = Encoders.product[ShardSummary]
    implicit val st: Encoder[MgState] = Encoders.product[MgState]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    implicit val rowEnc: Encoder[(Int, String)] = Encoders.tuple(
      Encoders.scalaInt, Encoders.STRING)
    df.select(
        pmod(xxhash64(expr(keyExpr).cast("string")), lit(shards)).cast("int")
          .as("shard"),
        expr(keyExpr).cast("string").as("k"))
      // null keys mirror the batch sketch's semantics (approx_top_k skips
      // nulls) — and a null could not survive anyway: Catalyst forbids
      // null map keys at state serialization
      .filter(col("k").isNotNull)
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[MgState, ShardSummary] {
        (shard: Int, rows: Iterator[(Int, String)],
            state: org.apache.spark.sql.streaming.GroupState[MgState]) =>
          val counters = collection.mutable.HashMap.empty[String, Long]
          val prior = state.getOption.getOrElse(MgState(0L, Map.empty))
          counters ++= prior.items
          var n = prior.processed
          rows.foreach { case (_, k) =>
            n += 1
            counters.get(k) match {
              case Some(c) => counters(k) = c + 1
              case None if counters.size < capacity => counters(k) = 1L
              case None =>
                // classic MG overflow: decrement every counter, drop zeros
                // (the absent key is "cancelled" against capacity others)
                counters.keys.toSeq.foreach { key =>
                  val c = counters(key) - 1
                  if (c == 0) counters.remove(key) else counters(key) = c
                }
            }
          }
          val next = MgState(n, counters.toMap)
          state.update(next)
          ShardSummary(shard, n, next.items)
      }
  }

  /** Corpus-wide top-`k` from an Update-mode sink of [[ShardSummary]] rows:
    * per shard the summary with the highest `processed` is the latest;
    * shards partition the key space, so concat + sort is exact w.r.t. the
    * summaries (no cross-shard merge ever needed). */
  def finalTopK(summaries: DataFrame, k: Int): DataFrame =
    summaries
      .groupBy(col("shard"))
      .agg(max_by(col("items"), col("processed")).as("items"))
      .select(explode(col("items")).as(Seq("item", "est_count")))
      .orderBy(col("est_count").desc, col("item").asc)
      .limit(k)
}
