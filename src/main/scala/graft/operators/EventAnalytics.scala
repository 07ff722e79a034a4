package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over large event logs: ordered funnels and
  * cohort retention — the downstream warehouse queries a Singer-fed event
  * table exists to answer.
  *
  * Scale design notes:
  *  - `funnel`: k chained per-user aggregates, every shuffle on the SAME
  *    user key (AQE reuses the partitioning across the chain). Per-user
  *    state is ONE timestamp per step — never a collected event list, so
  *    a power user with 10⁸ events costs the same as one with 10. The
  *    per-step frames shrink monotonically (funnel property), so each
  *    successive join is smaller than the last.
  *  - `retention`: ONE per-user aggregate collecting the distinct active
  *    weeks (map-side partial dedup; per-user state bounded by CALENDAR
  *    weeks — a 10-year log is ≤ 522 ints — never by event volume), then
  *    one cell aggregate. Two shuffles total; the distinct-then-join
  *    formulation costs four (distinct on (u, wk) partitioning satisfies
  *    neither the cohort groupBy(u) nor the join).
  */
object EventAnalytics {

  /** Ordered funnel: row `i` counts the distinct users whose events match
    * `steps(0..i)` IN ORDER — each step strictly after the user's earliest
    * completion of the previous step (ties at the same microsecond do NOT
    * advance the funnel). Returns `(step_idx, step, n_users)`, one row per
    * step, `step_idx` 1-based.
    *
    * Per-step recurrence: `t_i(u) = min ts of a `steps(i)` event of `u`
    * with `ts > t_{i-1}(u)`. Using the EARLIEST qualifying completion at
    * every step is what makes the greedy chain exact: any ordered
    * assignment of events can be left-shifted onto the greedy one. The
    * exchange argument never uses step distinctness, so REPEATED steps
    * (view -> add-to-cart -> view) work unchanged — each occurrence of a
    * repeated step filters its own frame and needs its own, strictly
    * later event.
    *
    * `maxGapMicros` adds the conversion-window constraint real funnels
    * carry ("purchase within 7 days of the click"): step `i` must ALSO
    * land within the window after `t_{i-1}`. NOTE the window is anchored
    * at the PREVIOUS step's earliest chain completion — a deterministic,
    * oracle-mirrorable recurrence, but STRICTER than "exists an ordered
    * chain with every per-step gap <= g": a user who would only convert
    * by re-anchoring on a LATER previous-step event is not counted
    * (A@1, A@20, B@25 with g=10: chain A@20->B@25 has gap 5, but B's
    * window is measured from A@1 and rejects it). The unwindowed chain
    * has no such gap — dropping the upper bound, an earlier completion
    * only loosens the `>` constraint, so the greedy chain is exact there.
    *
    * Intermediates are persisted while the chain builds (each is read
    * twice: next step's join + its own count) and released before
    * returning — the result frame stays persisted, k rows.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapMicros.forall(_ > 0), "maxGapMicros must be positive")
    val base = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("us"), col(typeCol).as("et"))
    // reached(i): one row per user who completed steps 0..i, with t = the
    // earliest completion time of step i under the chain constraint
    val reached = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (st, i)) =>
        val mine = base.filter(col("et") === st)
        val qual = acc.headOption match {
          case None => mine
          case Some(p) =>
            val chained = mine
              .join(p.select(col("u"), col("t").as("t_prev")), Seq("u"))
              .filter(col("us") > col("t_prev"))
            maxGapMicros.fold(chained)(g =>
              chained.filter(col("us") <= col("t_prev") + g))
        }
        qual.groupBy(col("u")).agg(min(col("us")).as("t")).persist() :: acc
    }.reverse
    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"),
          lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
    val out = counts.persist()
    out.count()
    reached.foreach(_.unpersist(false))
    out
  }

  /** Cohort retention: users are cohorted by the 7-day bucket (relative to
    * `originDate`, `yyyy-MM-dd`) of their FIRST event; each later active
    * bucket contributes one `(cohort_wk, wk_offset, n_users)` cell.
    * `wk_offset` 0 is the cohort week itself, so every cohort's offset-0
    * cell equals its size. Integer week arithmetic (`datediff div 7`) on
    * both engines — no date_trunc('week') locale semantics.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      originDate: String): DataFrame = {
    val wk = floor(datediff(to_date(col(tsCol)),
      to_date(lit(originDate))).cast("long") / 7).cast("long")
    events
      // null-timestamp events carry no week, and null users no cohort:
      // both dropped EXPLICITLY so the operator and its oracle agree by
      // construction (Spark's groupBy would keep a NULL-user group that
      // the oracle's equi-join silently drops)
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), wk.as("wk"))
      .groupBy(col("u")).agg(collect_set(col("wk")).as("wks"))
      // a user with no non-null events contributes no cells (absent here)
      .select(array_min(col("wks")).as("cohort_wk"),
        explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for every ordered pair of consecutive events (by `tsCol`, ties broken
    * on `tieCol` so the sequence is total-ordered and deterministic),
    * count the `(prev, next)` transition and report its row-conditional
    * probability `p(next | prev) = n / Σ_next n`.
    *
    * Output: `(prev, next, n, p)` with `p` rounded at 6 decimals — at most
    * `|event types|²` rows, a bounded result regardless of log size.
    *
    * Plan shape at scale: one window `lag` keyed by user (the natural
    * event-log partitioning), one hash aggregate onto the bounded
    * `(prev, next)` key space (map-side combined), and the row totals ride
    * a window over the ALREADY-aggregated matrix — no second pass over the
    * log, no driver loop. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val counts = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .withColumn("prev", lag(col(typeCol), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col(typeCol).as("next"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("prev"))
    counts.withColumn("p",
      round(col("n") / sum(col("n")).over(rowTotal), 6))
  }

  /** Stationary distribution of the [[transitionMatrix]] chain: `iters`
    * exact-integer power rounds of `x·P` from uniform — "where does the
    * user population settle" (the steady-state page/event mix). States
    * appearing only as a successor (chain ends) get a SELF-LOOP so their
    * mass persists instead of leaking (the standard absorbing-state fix,
    * applied identically by the oracle).
    *
    * Exactness: round k+1 mass of state j is
    * `Σ_i x_k(i)·n_ij div tot_i` — floor per (i,j) term, all longs.
    * With the default giga `scale`, each term's product is
    * ≤ scale·tot_i ≤ 10⁹·tot_i: in long range while row totals stay
    * under ~9·10⁹ transitions; beyond that (the 100 TB clickstream)
    * switch the product to DECIMAL(38,0) — plan shape unchanged. Floor
    * losses make Σx drift a few units below scale per round; they are
    * NOT renormalized (the oracle replays the identical drift).
    *
    * Plan shape: the transition matrix is bounded by |state|² (hash
    * aggregate over the log, map-side combined); each round is one
    * state-sized join of x onto the matrix plus one aggregate — the
    * pagerank shape on a bounded graph, no per-round log rescans.
    * Output: (state, mass_scaled). */
  def stationaryDistribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val counts = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .withColumn("prev", lag(col(typeCol), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col(typeCol).as("next"))
      .agg(count(lit(1)).as("n"))
    val states = counts.select(col("prev").as("state"))
      .union(counts.select(col("next").as("state"))).distinct()
    val sinks = states.join(counts.select(col("prev").as("state")).distinct(),
        Seq("state"), "left_anti")
      .select(col("state").as("prev"), col("state").as("next"),
        lit(1L).as("n"))
    val tot = counts.unionByName(sinks).groupBy(col("prev"))
      .agg(sum(col("n")).as("tot"))
    val e = counts.unionByName(sinks).join(tot, Seq("prev")).cache()
    val nStates = states.count()
    require(nStates > 0, "stationaryDistribution over an empty chain")
    var x = states.select(col("state"), lit(scale / nStates).as("m"))
    for (_ <- 0 until iters) {
      x = e.join(broadcast(x.select(col("state").as("prev"), col("m"))),
          Seq("prev"))
        .select(col("next").as("state"), expr("m * n div tot").as("c"))
        .groupBy(col("state")).agg(sum(col("c")).as("m"))
    }
    // zero-mass states (no inbound transitions) fall out of the aggregate;
    // the readout re-lists them with explicit 0 so every state reports
    val r = states.join(x, Seq("state"), "left")
      .select(col("state"), coalesce(col("m"), lit(0L)).as("mass_scaled"))
      .localCheckpoint()
    e.unpersist(false)
    r
  }

  /** First-touch / last-touch conversion attribution: every `convType`
    * event is credited to the user's earliest touch overall (first-touch
    * model) and to the latest touch at-or-before the conversion
    * (last-touch model); conversions with no preceding touch land in the
    * `(none)` bucket, so each model's column sums to the conversion count.
    *
    * Last-touch rides [[AsOfJoin.joinBackward]] — one shuffle, no per-pair
    * join — and first-touch is one per-user min-struct aggregate joined
    * back; both are key-partitioned on the user, and the final per-type
    * rollup is channel-cardinality-sized. Touches are pre-aggregated to
    * one row per (user, ts) (lexicographic max type) per the as-of
    * determinism contract. Output: (touch_type, last_touch, first_touch).
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String,
      touchTypes: Seq[String]): DataFrame = {
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol).as("t_user"), col(tsCol).as("t_ts"))
      .agg(max(col(typeCol)).as("touch_type"))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("c_user"), col(tsCol).as("c_ts"))
    val lastT = AsOfJoin.joinBackward(conv, touches,
      leftKeys = Seq("c_user"), rightKeys = Seq("t_user"),
      leftTs = "c_ts", rightTs = "t_ts",
      rightValues = Seq("touch_type"))
    val firstT = touches.groupBy(col("t_user").as("c_user"))
      .agg(min(struct(col("t_ts"), col("touch_type"))).as("f"))
      .select(col("c_user"), col("f.t_ts").as("f_ts"),
        col("f.touch_type").as("f_type"))
    val firstAttr = conv.join(firstT, Seq("c_user"), "left")
      .select(when(col("f_ts") <= col("c_ts"), col("f_type")).as("ft"))
    val lastCounts = lastT
      .select(coalesce(col("touch_type"), lit("(none)")).as("touch_type"))
      .groupBy(col("touch_type")).agg(count(lit(1)).as("last_touch"))
    val firstCounts = firstAttr
      .select(coalesce(col("ft"), lit("(none)")).as("touch_type"))
      .groupBy(col("touch_type")).agg(count(lit(1)).as("first_touch"))
    lastCounts.join(firstCounts, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"))
  }

  /** Top-k user-journey paths: sessionize by inactivity gap (the lag +
    * cumulative-sum-of-breaks form of [[graft.queries]] q41), take each
    * session's first `maxLen` event types in (ts, tie) order, count
    * identical paths, return the `topK` most frequent.
    *
    * State discipline: rows are cut to `maxLen` per session BEFORE the
    * path aggregate (row_number filter), so the collected array is
    * bounded by construction — a pathological week-long session
    * contributes `maxLen` rows, not its event count. The per-path rollup
    * reduces map-side and the top-k is TakeOrdered. The collected structs
    * are (ts, tie, type) and `array_sort` orders by exactly those fields,
    * so the path string is total-order deterministic.
    * Output: (path, n_sessions).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, gapMicros: Long, maxLen: Int,
      topK: Int): DataFrame = {
    val byUser = Window.partitionBy(col("u"))
      .orderBy(col("us").asc, col("tie").asc)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events.select(col(userCol).as("u"),
        unix_micros(col(tsCol)).as("us"), col(typeCol).as("et"),
        col(tieCol).as("tie"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(byUser) > gapMicros
          || lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(cum))
    val bySess = Window.partitionBy(col("u"), col("sid"))
      .orderBy(col("us").asc, col("tie").asc)
    sess.withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= maxLen)
      .groupBy(col("u"), col("sid"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("us"), col("tie"), col("et")))),
        x => x.getField("et"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }
}
