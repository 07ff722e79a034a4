package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-side dedup + custom state.
  *
  * The Singer delivery contract is at-least-once (STATE echo after commit —
  * SURVEY §3.1 step 6): a crash between write and state echo replays
  * records. `dedupWithinWatermark` drops those replays inside the watermark
  * horizon with bounded state — the streaming counterpart of
  * [[graft.operators.Dedup.exact]].
  *
  * Every stateful operator here keeps its state in the configured state
  * store. The default provider holds state ON-HEAP per executor — fine for
  * tests and modest key counts; at production key cardinality start the
  * query under [[StateStores.withRocksDB]] (off-heap, disk-spilling,
  * incremental checkpoints). Results are provider-independent.
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
      lateness: String, bound: String,
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bound") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"),
        joinType)

  /** Watermarked stream-stream LEFT OUTER interval join: inner matches
    * emit as they pair; an unmatched left row emits with nulled right
    * columns once the watermark proves no matching right row can still
    * arrive (`leftTs + bound` passes the right watermark). Same bounded
    * state as the inner form — the outer semantics change only WHEN an
    * unmatched row is released, never how much state is held. The
    * unmatched-side capability every pipeline join audit needs ("which
    * events never found a partner"); full replay equals the batch left
    * join (q71 parity oracle). */
  def intervalJoinLeft(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String, bound: String): DataFrame =
    intervalJoin(left, right, leftKey, rightKey, leftTs, rightTs,
      lateness, bound, joinType = "left_outer")

  /** Full-outer form: unmatched rows of BOTH sides emit null-joined once
    * their match windows close behind the watermark — same bounded state,
    * symmetric release rule (each side's unmatched row is gated by its own
    * `ts + bound` against the global watermark). */
  def intervalJoinFull(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String, bound: String): DataFrame =
    intervalJoin(left, right, leftKey, rightKey, leftTs, rightTs,
      lateness, bound, joinType = "full_outer")

  /** Custom-state surface (`mapGroupsWithState`): running per-key event
    * counts across micro-batches. The state is one long per key — the
    * minimal stateful-operator shape on which session windows, CDC upserts,
    * and incremental sketches are all built. */
  /** Open-session state: epoch-millis bounds + event count. */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** A closed session as emitted downstream. `closed_by` is `"gap"` when
    * the inactivity gap expired (including via event-time timeout) and
    * `"cap"` when the max-duration cap split a continuously-active key. */
  final case class ClosedSession(key: String, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, closed_by: String)

  /** Event-time sessionization with a MAX-DURATION CAP, via
    * `flatMapGroupsWithState` + `EventTimeTimeout` — the custom-state shape
    * the built-in `session_window` cannot express: a key that never goes
    * quiet (bots, monitors) would otherwise grow one session forever, so
    * sessions are force-closed once they span `maxDuration` of event time.
    *
    * Emission is append-only and closed-sessions-only: a session closes
    * either inline (a row arrives past the gap / over the cap) or by the
    * event-time timeout once the watermark passes `last + gap` — so every
    * session is emitted exactly once, and state per key is one
    * [[OpenSession]] (bounded by key cardinality, evicted on timeout).
    *
    * At scale this is one shuffle on the key into the state store, state
    * O(active keys within the watermark horizon) — the same shape as the
    * built-in session window, with the cap policy added. Durations are
    * `"<n> <unit>"` strings (ms/seconds/minutes/hours).
    */
  def cappedSessions(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, maxDuration: String, lateness: String): Dataset[ClosedSession] = {
    val gapMs = durationMs(gap)
    val capMs = durationMs(maxDuration)
    require(gapMs > 0 && capMs > 0, "gap and maxDuration must be positive")
    implicit val stEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val rowEnc: Encoder[(String, java.sql.Timestamp)] =
      Encoders.tuple(Encoders.STRING, Encoders.TIMESTAMP)
    def close(key: String, s: OpenSession, why: String) = ClosedSession(
      key, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
      s.n, why)
    events
      .select(col(keyCol).cast("string").as("_1"),
        col(tsCol).cast("timestamp").as("_2"))
      .withWatermark("_2", lateness)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new rows: the gap expired
            val done = close(key, state.get, "gap")
            state.remove()
            Iterator.single(done)
          } else {
            // interval merge in event-time order: the batch's rows plus the
            // open session, sorted by start, folded with the gap/cap rules.
            // Sorting (not arrival order) makes the result replay-stable,
            // and seating the open session at its sorted position handles
            // cross-batch stragglers: a late row older than the open
            // session merges backward when within the gap, or closes as its
            // own earlier session — it is never silently folded forward.
            val out = Seq.newBuilder[ClosedSession]
            val items = (state.getOption.toSeq ++
                rows.map(r => OpenSession(r._2.getTime, r._2.getTime, 1)))
              .sortBy(s => (s.startMs, s.lastMs))
            var cur = items.head
            for (it <- items.tail) {
              if (it.startMs - cur.lastMs > gapMs) {
                out += close(key, cur, "gap"); cur = it
              } else if (it.lastMs - cur.startMs > capMs) {
                out += close(key, cur, "cap"); cur = it
              } else {
                cur = OpenSession(cur.startMs,
                  math.max(cur.lastMs, it.lastMs), cur.n + it.n)
              }
            }
            state.update(cur)
            // a stragglers-only batch can arrive with the watermark already
            // past last+gap (the timeout would have fired next batch); a
            // timeout timestamp at/below the watermark is rejected, so
            // clamp to watermark+1 — the overdue session closes next batch
            state.setTimeoutTimestamp(math.max(cur.lastMs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  private[streaming] def durationMs(s: String): Long = {
    val parts = s.trim.split("\\s+")
    require(parts.length == 2, s"duration must be '<n> <unit>', got '$s'")
    val v = parts(0).toLong
    parts(1).toLowerCase match {
      case "ms" | "millisecond" | "milliseconds" => v
      case "second" | "seconds"                  => v * 1000L
      case "minute" | "minutes"                  => v * 60000L
      case "hour" | "hours"                      => v * 3600000L
      case u => throw new IllegalArgumentException(s"unknown duration unit '$u'")
    }
  }

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
