package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Streaming funnel: the unbounded-stream counterpart of
  * [[graft.operators.EventAnalytics.funnel]], with ONE timestamp of
  * per-user state per step.
  *
  * The batch recurrence — `t_i(u)` = min ts of a `steps(i)` event with
  * `ts > t_{i-1}(u)` (and `ts <= t_{i-1} + maxGap` when windowed) — has
  * per-user state of exactly the chain `t_0..t_{d-1}`, which is the
  * `mapGroupsWithState` shape: each micro-batch folds the user's new
  * events, in timestamp order, onto the chain, extending it whenever the
  * next event matches the next incomplete step. A single in-order scan
  * computes the greedy chain exactly (induction: after any prefix of the
  * ts-ordered event sequence, the chain equals the batch recurrence over
  * that prefix — each extension takes the EARLIEST qualifying event for
  * its step, which is what makes the greedy chain exact; see the batch
  * scaladoc's exchange argument, which also covers repeated steps).
  *
  * Exactness contract: per-user events must arrive in timestamp order
  * ACROSS micro-batches (within a batch they are sorted here). A late
  * event cannot retroactively shorten an already-locked chain prefix —
  * the same in-order trade the watermark dedup and heavy-hitter
  * operators document. The AvailableNow replay over a static corpus
  * satisfies the contract, which is what the q81 parity oracle checks
  * against the batch funnel.
  *
  * State is BOUNDED BY CONSTRUCTION: at most `steps.length` longs per
  * user, forever — no event history is retained (asserted in
  * `StreamingSpec`). Null users/timestamps are dropped explicitly (a
  * null can't key the state store); the oracle data carries none, so
  * batch parity is unaffected.
  */
object StreamingFunnel {

  /** A user's funnel progress after a micro-batch: `depth` = number of
    * completed steps (monotone — "latest wins" for Update-mode sinks is
    * a per-user max). */
  final case class UserFunnel(user: Long, depth: Int)

  /** Per-user chain persisted in the state store: earliest completion
    * timestamps of steps `0..depth-1` (public: codegen'd state
    * (de)serializers construct it reflectively). */
  final case class ChainState(ts: Seq[Long])

  /** Per-user greedy step chain over an unbounded stream: emits the
    * user's refreshed depth every micro-batch that touches them (Update
    * output mode). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapMicros: Option[Long] = None): Dataset[UserFunnel] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMicros.forall(_ > 0), "maxGapMicros must be positive")
    implicit val out: Encoder[UserFunnel] = Encoders.product[UserFunnel]
    implicit val st: Encoder[ChainState] = Encoders.product[ChainState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val rowEnc: Encoder[(Long, Long, String)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
    val stepArr = steps.toArray
    // project + prune BEFORE the stateful operator: only step-typed events
    // reach the state store shuffle (the same pushdown the batch funnel
    // gets from its per-step filters)
    events.select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("us"), col(typeCol).cast("string").as("et"))
      .filter(col("u").isNotNull && col("us").isNotNull &&
        col("et").isin(steps.distinct: _*))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[ChainState, UserFunnel] {
        (u: Long, rows: Iterator[(Long, Long, String)],
            state: org.apache.spark.sql.streaming.GroupState[ChainState]) =>
          val chain = scala.collection.mutable.ArrayBuffer[Long](
            state.getOption.map(_.ts).getOrElse(Seq.empty): _*)
          // iterator order is arbitrary — sort the batch's events by ts
          // (ties by type for determinism; distinct step types make a
          // same-ts tie unobservable in the chain anyway)
          val evs = rows.toArray.sortBy(e => (e._2, e._3))
          evs.foreach { case (_, ts, et) =>
            val d = chain.length
            if (d < stepArr.length && et == stepArr(d) &&
                (d == 0 || (ts > chain(d - 1) &&
                  maxGapMicros.forall(ts - chain(d - 1) <= _)))) {
              chain += ts
            }
          }
          state.update(ChainState(chain.toSeq))
          UserFunnel(u, chain.length)
      }
  }

  /** Batch-funnel-shaped step counts from an Update-mode sink of
    * [[UserFunnel]] rows: a user's latest depth is their max (depth is
    * monotone), step `i` counts users with depth >= i. Output matches
    * [[graft.operators.EventAnalytics.funnel]]: (step_idx, step,
    * n_users) with a row per step even at zero. */
  def stepCounts(sink: DataFrame, steps: Seq[String]): DataFrame = {
    val latest = sink.groupBy(col("user")).agg(max(col("depth")).as("depth"))
    steps.zipWithIndex.map { case (st, i) =>
      latest.filter(col("depth") >= i + 1)
        .agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
