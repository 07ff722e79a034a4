package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Streaming-side dedup + custom state.
  *
  * The Singer delivery contract is at-least-once (STATE echo after commit —
  * SURVEY §3.1 step 6): a crash between write and state echo replays
  * records. `dedupWithinWatermark` drops those replays inside the watermark
  * horizon with bounded state — the streaming counterpart of
  * [[graft.operators.Dedup.exact]].
  */
object StreamingDedup {

  /** Exact streaming dedup on key columns with watermark-bounded state.
    * State size is O(keys within the lateness horizon), not O(stream). */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String], tsCol: String,
      lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class KeyCount(key: String, n: Long)

  /** Stream-static enrichment: a streaming frame joined to a bounded
    * dimension table. The static side is broadcast (dimensions are small by
    * definition), so each micro-batch enriches executor-locally — no
    * per-batch shuffle, no state. This is the canonical streaming join: the
    * stream-stream variant (watermarked, stateful) only pays off when BOTH
    * sides are unbounded. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String, joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), joinType)
      .drop(dim(dimKey))

  /** Stream-stream inner join on a key within a symmetric event-time
    * interval: `|leftTs - rightTs| <= bound`. Both sides carry watermarks,
    * so the join state each side buffers is limited to
    * `lateness + bound` of event time — the condition every unbounded
    * stream-stream join needs to avoid unbounded state (without the time
    * bound Spark would have to keep EVERY past row of both streams). Inner
    * semantics: match rows are emitted as they pair up; the watermark only
    * governs state eviction, so a full replay produces exactly the batch
    * join's result (checked by the q55 parity oracle).
    *
    * Column names must be pre-disambiguated by the caller (streaming frames
    * can't be dealiased after the fact the way static ones can). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String, bound: String): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bound") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"))

  /** Custom-state surface (`mapGroupsWithState`): running per-key event
    * counts across micro-batches. The state is one long per key — the
    * minimal stateful-operator shape on which session windows, CDC upserts,
    * and incremental sketches are all built. */
  def runningCounts(events: DataFrame, keyCol: String): Dataset[KeyCount] = {
    implicit val enc: Encoder[KeyCount] = Encoders.product[KeyCount]
    implicit val se: Encoder[Long] = Encoders.scalaLong
    implicit val ke: Encoder[String] = Encoders.STRING
    events.select(col(keyCol).cast("string"))
      .as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, KeyCount] {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          KeyCount(key, n)
      }
  }
}
