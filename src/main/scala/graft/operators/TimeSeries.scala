package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series preparation over event streams: regular-grid resampling with
  * gap-fill, last-observation-carried-forward (LOCF) imputation, and
  * event-rate anomaly scoring. These are the feature-engineering passes a
  * training pipeline runs over behavioral logs before windowed models.
  *
  * Determinism contract (shared with the rest of the engine): every
  * cross-row double sum is integerized first (micro-units as longs), so
  * aggregation ORDER cannot change the result and the DuckDB oracles
  * hash-match bit-for-bit; the only double operations are single divisions
  * and square roots of exact values, which IEEE 754 rounds identically in
  * both engines.
  */
object TimeSeries {

  /** Resample `(key, ts, value)` onto a per-key regular grid of
    * `binSeconds`-wide buckets spanning that key's own [min, max] bin
    * range, averaging observations inside a bucket and forward-filling
    * empty buckets from the last observed one (LOCF). Buckets before the
    * key's first observation do not exist by construction.
    *
    * Output: (key, bin_us, value, is_gap) — bin start in epoch micros,
    * `value` the (filled) bucket average rounded at 6 decimals, `is_gap`
    * true where the bucket had no observations.
    *
    * Plan shape at scale: one groupBy(key, bin) with map-side combine over
    * the integerized values, one per-key min/max aggregate whose grid
    * EXPLODES from a bounded `sequence` (span/binSeconds elements — time
    * spans are bounded in practice; nothing here is proportional to event
    * count), one key-local left join of grid to buckets, one key-partitioned
    * window for the carry-forward. All four stages co-partition on `key`.
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    // bucket start in epoch micros; value integerized to micro-units
    val obs = events.select(
        col(keyCol).as("key"),
        // `div` (not `/`): Column `/` is DOUBLE division, whose rounding
        // could land an epoch-micros quotient on the wrong bucket boundary
        expr(s"unix_micros($tsCol) div ${binUs}L * ${binUs}L").as("bin_us"),
        round(col(valCol) * 1e6).cast("long").as("v_micro"))
      .groupBy(col("key"), col("bin_us"))
      .agg(sum(col("v_micro")).as("sv"), count(lit(1)).as("cnt"))
    val grid = obs.groupBy(col("key"))
      .agg(min(col("bin_us")).as("mn"), max(col("bin_us")).as("mx"))
      .select(col("key"),
        explode(sequence(col("mn"), col("mx"), lit(binUs))).as("bin_us"))
    val w = Window.partitionBy(col("key")).orderBy(col("bin_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bin_us"), "left")
      .withColumn("fsv", last(col("sv"), ignoreNulls = true).over(w))
      .withColumn("fcnt", last(col("cnt"), ignoreNulls = true).over(w))
      .select(col("key"), col("bin_us"),
        round(col("fsv").cast("double") / col("fcnt") / 1e6, 6).as("value"),
        col("sv").isNull.as("is_gap"))
  }

  /** [[resampleLocf]]'s grid with LINEAR interpolation instead of
    * carry-forward: an empty bucket between two observed ones takes
    * `prev + (next − prev) · (bin − prevBin)/(nextBin − prevBin)`; empty
    * buckets after the last observation fall back to LOCF (no `next` to
    * interpolate toward). Same plan shape as LOCF plus one more window
    * pass (the forward-looking `first(…, ignoreNulls)` over the reversed
    * frame bounds); the interpolation weight is a single exact-integer
    * division and each arithmetic step is one IEEE op, mirrored
    * literally by the oracle. Output: (key, bin_us, value_micro, is_gap)
    * — the value in integer MICRO-units: interpolated blends land on
    * exact decimal halves constantly, and fractional-scale round() is
    * the one place the engines disagree (Spark rounds the exact decimal
    * expansion, DuckDB rounds after a float multiply — 1-ulp splits at
    * ties); scale-0 rounding of an identical double is exact in both.
    */
  def resampleInterp(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    val obs = events.select(
        col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div ${binUs}L * ${binUs}L").as("bin_us"),
        round(col(valCol) * 1e6).cast("long").as("v_micro"))
      .groupBy(col("key"), col("bin_us"))
      .agg(sum(col("v_micro")).as("sv"), count(lit(1)).as("cnt"))
      // the bucket's observed average in micro-units: ONE division of
      // exact integers — the quantity interpolation runs on
      .withColumn("avg_micro", col("sv").cast("double") / col("cnt"))
    val grid = obs.groupBy(col("key"))
      .agg(min(col("bin_us")).as("mn"), max(col("bin_us")).as("mx"))
      .select(col("key"),
        explode(sequence(col("mn"), col("mx"), lit(binUs))).as("bin_us"))
    val back = Window.partitionBy(col("key")).orderBy(col("bin_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("key")).orderBy(col("bin_us"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = grid.join(obs, Seq("key", "bin_us"), "left")
      .withColumn("pv", last(col("avg_micro"), ignoreNulls = true).over(back))
      .withColumn("pb", last(when(col("avg_micro").isNotNull, col("bin_us")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("avg_micro"), ignoreNulls = true).over(fwd))
      .withColumn("nb", first(when(col("avg_micro").isNotNull, col("bin_us")),
        ignoreNulls = true).over(fwd))
    val frac = (col("bin_us") - col("pb")).cast("double") /
      (col("nb") - col("pb")).cast("double")
    val interp = when(col("avg_micro").isNotNull, col("avg_micro"))
      .when(col("nv").isNull, col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) * frac)
    filled.select(col("key"), col("bin_us"),
      round(interp).cast("long").as("value_micro"),
      col("avg_micro").isNull.as("is_gap"))
  }

  /** Per-(group, bucket) event-COUNT z-scores against the group's own
    * count distribution: |z| flags burst/outage buckets. Variance uses the
    * integer-moment identity Σc² − (Σc)²/n over exact long sums, so the
    * whole statistic is order-free; counts and moments stay well under
    * 2^53. Output: (grp, bin_us, cnt, z) with z rounded at 6 decimals,
    * NULL when the group's variance is zero.
    *
    * Plan shape: one groupBy(grp, bin) count, one groupBy(grp) moment
    * aggregate (rows = |groups| × span/bin — bounded), one broadcast-sized
    * join back. Nothing driver-side.
    */
  def rateAnomaly(events: DataFrame, grpCol: String, tsCol: String,
      binSeconds: Long): DataFrame = {
    val cnts = binCounts(events, grpCol, tsCol, binSeconds)
    cnts.join(broadcast(momentStats(cnts)), Seq("grp"))
      .select(col("grp"), col("bin_us"), col("cnt"),
        when(col("variance") > 0,
          round((col("cnt").cast("double") - col("mean")) / sqrt(col("variance")), 6))
          .as("z"))
  }

  /** Per-(group, bucket) event counts: (grp, bin_us, cnt). */
  def binCounts(events: DataFrame, grpCol: String, tsCol: String,
      binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    events.select(col(grpCol).as("grp"),
        expr(s"unix_micros($tsCol) div ${binUs}L * ${binUs}L").as("bin_us"))
      .groupBy(col("grp"), col("bin_us"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group count moments over bucket counts: (grp, mean, variance) —
    * the trained BASELINE a streaming scorer joins against (see
    * `streaming.StreamingAnomaly`). Exact integer moments as in
    * [[rateAnomaly]]. */
  def momentStats(cnts: DataFrame): DataFrame =
    cnts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("variance",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) / col("n"))
      .select(col("grp"), col("mean"), col("variance"))

  /** Time-weighted average (TWAP): each observation's value holds until
    * the key's next observation, so the mean weights each value by its
    * holding duration — the standard metrics/market aggregate where plain
    * AVG over-counts bursts. The last observation has no successor and
    * carries zero weight (interval-boundary convention); single-observation
    * keys yield NULL.
    *
    * One lead window + one aggregate, co-partitioned on the key. Values
    * integerized to micro-units and durations exact micros, so both sums
    * are order-free longs and the single division runs on exact inputs.
    * Output: (key, n, twap) with twap in source units rounded at 6.
    */
  def twap(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("us").asc)
    events.select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("us"),
        round(col(valCol) * 1e6).cast("long").as("vm"))
      .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
      // value·duration products reach ~1e21 (micro-value × micro-second
      // gaps) — past long range, where Spark would wrap silently while
      // the oracle's HUGEINT would not. Decimal(38,0) keeps the sum exact;
      // the one cast to double afterwards is correctly rounded in any
      // engine.
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("vm").cast("decimal(38,0)") * col("dur")).as("sv"),
        sum(col("dur")).as("sd"))
      .select(col("key"), col("n"),
        when(col("sd") > 0,
          round(col("sv").cast("double") / col("sd").cast("double") / 1e6, 6))
          .as("twap"))
  }

  /** Per-key lag / rolling-window features — the classic tabular
    * feature-engineering pass before sequence models: previous-1/-2
    * values and the rolling `win`-row sum/max, all in exact micro-unit
    * longs (no float rolling mean exists; consumers divide the exact
    * sum). One window partition per key, ordered by (ts, tie) for total
    * order; state is the frame's `win` rows by construction.
    * Output: (key, us, vm, lag1, lag2, roll_sum, roll_n, roll_max).
    */
  def rollingFeatures(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, win: Int): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("us").asc, col("tie").asc)
    val frame = w.rowsBetween(-(win - 1), Window.currentRow)
    events.select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("us"),
        round(col(valCol) * 1e6).cast("long").as("vm"),
        col(tieCol).as("tie"))
      .withColumn("lag1", lag(col("vm"), 1).over(w))
      .withColumn("lag2", lag(col("vm"), 2).over(w))
      .withColumn("roll_sum", sum(col("vm")).over(frame))
      .withColumn("roll_n", count(col("vm")).over(frame))
      .withColumn("roll_max", max(col("vm")).over(frame))
      .select(col("key"), col("us"), col("vm"), col("lag1"), col("lag2"),
        col("roll_sum"), col("roll_n"), col("roll_max"))
  }

  /** Seasonal-baseline anomaly detection: each event's value against its
    * (group, hour-of-day) slot mean — the "seasonal naive" residual that
    * catches values normal in absolute terms but wrong for their hour.
    * Slot means come from exact micro-integer sums (one aggregate; slots
    * are group×24, broadcast back); residuals are exact-input divisions;
    * the top-k largest |residual| rows reduce through TakeOrdered.
    * Output: (id, grp, slot, value_micro, seasonal_micro, resid_micro).
    */
  def seasonalResiduals(events: DataFrame, idCol: String, grpCol: String,
      tsCol: String, valCol: String, topK: Int): DataFrame = {
    val base = events.select(col(idCol).as("id"), col(grpCol).as("grp"),
      hour(col(tsCol)).cast("long").as("slot"),
      round(col(valCol) * 1e6).cast("long").as("vm"))
    val slots = base.groupBy(col("grp"), col("slot"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("n"))
    base.join(broadcast(slots), Seq("grp", "slot"))
      .withColumn("seasonal",
        col("sv").cast("double") / col("n"))
      .withColumn("resid", col("vm") - col("seasonal"))
      .orderBy(abs(col("resid")).desc, col("id").asc)
      .limit(topK)
      .select(col("id"), col("grp"), col("slot"),
        col("vm").as("value_micro"),
        round(col("seasonal")).cast("long").as("seasonal_micro"),
        round(col("resid")).cast("long").as("resid_micro"))
  }

  /** One-sided (upper) CUSUM change detection over each group's daily
    * total series — the classic Page cumulative-sum statistic
    * `S_t = max(0, S_{t-1} + (x_t − μ − k))` with allowance `k` a rational
    * fraction (`slackNum/slackDen`) of the group mean. A sustained upward
    * mean shift accumulates; noise resets to zero.
    *
    * The max(0, ·) recursion is NOT expressible as a plain running sum —
    * but its closed form is: with `C_t = Σ z_i` (no clamping),
    * `S_t = C_t − min(0, min_{j≤t} C_j)` (the reset subtracts the deepest
    * prefix low). That identity turns a sequential recurrence into two
    * running-window aggregates, so the whole statistic is one
    * group-partitioned window pass — embarrassingly parallel across
    * groups, no sequential driver loop.
    *
    * Determinism: the deviation is scaled to clear both rationals —
    * `z_t = slackDen·(n·x_t − Σx) − slackNum·Σx` — all BIGINT-exact, so
    * the running sums are order-independent and the oracle hash-matches;
    * the only double op is the final single division by `slackDen·n`.
    * Headroom: daily micro totals ~1e12 × days × den stays < 2^63 until
    * ~1e5 days of 1e13-micro groups — far past any real window.
    *
    * Output: (grp, d, x_micro, s_micro) for every group-day; the
    * changepoint candidate is the argmax of `s_micro` within a group.
    */
  def cusum(events: DataFrame, grpCol: String, tsCol: String,
      valCol: String, slackNum: Long = 1L, slackDen: Long = 2L): DataFrame = {
    require(slackDen > 0 && slackNum >= 0, "allowance must be >= 0")
    val daily = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"),
        round(col(valCol) * 1e6).cast("long").as("vm"))
      .groupBy(col("grp"), col("d"))
      .agg(sum(col("vm")).as("x"))
    val wAll = Window.partitionBy(col("grp"))
    val wRun = Window.partitionBy(col("grp")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("x")).over(wAll))
      .withColumn("z",
        lit(slackDen) * (col("n") * col("x") - col("sx"))
          - lit(slackNum) * col("sx"))
      .withColumn("cum", sum(col("z")).over(wRun))
      .withColumn("sv", col("cum") - least(lit(0L), min(col("cum")).over(wRun)))
      .select(col("grp"), col("d"), col("x").as("x_micro"),
        round(col("sv").cast("double")
          / (lit(slackDen.toDouble) * col("n").cast("double")))
          .cast("long").as("s_micro"))
  }

  /** Autocorrelation of each group's daily EVENT-COUNT series at lags
    * 1..`maxLag` — the seasonality probe (weekly traffic rhythm, batch-
    * job cadence) run before any forecasting model: r_k near 1 at k = 7
    * means a weekly cycle. Exact arithmetic by multiplying the mean
    * through: with S = Σx and n days,
    * `r_k = Σ_t (n·x_t − S)(n·x_{t+k} − S) / Σ_t (n·x_t − S)²` — the n²
    * scaling cancels, every sum is an exact long (daily counts keep
    * n·x ≪ 2³¹, squares ≪ 2⁶³ — the cusum headroom note), and the
    * single division mirrors as one double, micro-scaled. Lag k means a
    * CALENDAR lag of k days: each group's [min(d), max(d)] range is
    * densified (`sequence` + left join, zero-count days contribute x = 0)
    * before indexing, so r₇ reads as "one week earlier" even on sparse
    * series — without the densify, lag 7 would silently mean "7th prior
    * OBSERVED day". The dense table stays day-grain bounded (span days ×
    * groups), then one self-join per exploded lag on (grp, rn + k):
    * day-grain × maxLag rows, never corpus-grain. Constant series → NULL
    * (variance 0). Output: (grp, lag, n_days, acf_micro). */
  def acf(events: DataFrame, grpCol: String, tsCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val observed = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
    val daily = observed.groupBy(col("grp"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("grp"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(observed, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("x"), lit(0L)).as("x"))
    val wAll = Window.partitionBy(col("grp"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("d"))
    val idx = daily
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("x")).over(wAll))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("cx", col("n") * col("x") - col("sx"))
      .select(col("grp"), col("rn"), col("n"), col("cx"))
    val den = idx.groupBy(col("grp"))
      .agg(max(col("n")).as("n_days"), sum(col("cx") * col("cx")).as("den"))
    val lags = idx.select(col("grp"), col("rn"), col("cx"),
        explode(expr(s"sequence(1, ${maxLag}L)")).as("lag"))
      .withColumn("rn2", col("rn") + col("lag"))
    val num = lags.join(
        idx.select(col("grp"), col("rn").as("rn2"), col("cx").as("cxl")),
        Seq("grp", "rn2"))
      .groupBy(col("grp"), col("lag"))
      .agg(sum(col("cx") * col("cxl")).as("num"))
    den.join(num, Seq("grp"))
      .select(col("grp"), col("lag"), col("n_days"), expr(
        """CASE WHEN den = 0 THEN CAST(NULL AS BIGINT)
          |ELSE CAST(round(1e6 * CAST(num AS DOUBLE) / den) AS BIGINT)
          |END""".stripMargin).as("acf_micro"))
  }

  /** Merge a key's overlapping-or-touching intervals into islands (the
    * gaps-and-islands pattern): an interval starts a new island when its
    * start exceeds the running max end of everything before it. Output:
    * one row per island — (key, island_start, island_end, n_intervals) in
    * micros. One ranked window + running max + one aggregate, all
    * co-partitioned on the key; interval QA for validity ranges (SCD2
    * history, session spans) at any scale.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("s").asc, col("e").asc)
    val prevMax = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol).as("key"), col(startCol).as("s"),
        col(endCol).as("e"))
      .withColumn("brk",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col("key"), col("island_start"), col("island_end"),
        col("n_intervals"))
  }

  /** Theil-Sen robust trend of each group's daily event counts — the
    * outlier-proof replacement for the per-group OLS slope (one traffic
    * spike drags least-squares; the MEDIAN of pairwise slopes shrugs it
    * off, 29.3% breakdown point). For every day pair i < j (CALENDAR time
    * axis: t = epoch day, so gaps weigh correctly without densifying),
    * slope_ij = (x_j − x_i)/(t_j − t_i), micro-rounded — ONE mirrored
    * double division per pair, deterministic tie order (slope, t_i, t_j).
    * The median is the SQL-standard lower median (rank ⌈m/2⌉ by
    * row_number — an exact element, not an interpolated average, so the
    * hash compare is integer-exact).
    *
    * Scale: pairs are DAY-grain per group — C(span, 2) ≈ 66 k pairs for a
    * year — generated by a range self-join inside each group partition and
    * ranked by a GROUP-partitioned window (parallel across groups, never
    * a corpus-grain single partition). The day-grain contract is ENFORCED
    * (the `requireCompactDomain` discipline of the Mann-Whitney/KS
    * family): a group spanning more than `maxSpanDays` days fails loud —
    * C(span, 2) day pairs in one group partition is exactly the skew bomb
    * the cap exists for. For multi-decade series, bucket to weeks first
    * and raise the bound deliberately.
    * Output: (grp, n_days, n_pairs, slope_micro) — slope in events/day
    * micro-units; groups with one day (no pairs) are absent. */
  def theilSen(events: DataFrame, grpCol: String, tsCol: String,
      maxSpanDays: Int = 2000): DataFrame = {
    val daily = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
      .select(col("grp"), datediff(col("d"), lit("1970-01-01")).cast("long")
        .as("t"), col("x"))
    // group-grain span check, one ≤|groups|-row aggregate folded to a
    // 1-row max — the pair stage below is quadratic in the span, so the
    // guard runs BEFORE any pair is emitted
    val spanRow = daily.groupBy(col("grp"))
      .agg((max(col("t")) - min(col("t")) + 1L).as("span"))
      .agg(max(col("span"))).collect()(0)
    val maxSpan = if (spanRow.isNullAt(0)) 0L else spanRow.getLong(0)
    require(maxSpan <= maxSpanDays,
      s"theilSen: a group spans $maxSpan days, past maxSpanDays=" +
        s"$maxSpanDays — C(span, 2) day pairs in one group partition; " +
        "bucket the series to weeks first or raise the bound deliberately")
    // renamed-column self-join: a col("a.t") < col("b.t") predicate over
    // two aliases of ONE lineage can resolve both sides to the same
    // attribute (t < t = false → silently empty); Seq-key join over
    // renamed projections is unambiguous
    val pairs = daily.select(col("grp"), col("t").as("ti"),
        col("x").as("xi"))
      .join(daily.select(col("grp"), col("t").as("tj"), col("x").as("xj")),
        Seq("grp"))
      .filter(col("ti") < col("tj"))
      .select(col("grp"), col("ti"), col("tj"),
        expr("CAST(round(1e6 * CAST(xj - xi AS DOUBLE) / (tj - ti)) " +
          "AS BIGINT)").as("slope_micro"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("slope_micro").asc, col("ti").asc, col("tj").asc)
    val cnt = Window.partitionBy(col("grp"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(cnt))
      .filter(expr("rn = (m + 1) div 2"))
      .join(daily.groupBy(col("grp")).agg(count(lit(1)).as("n_days")),
        Seq("grp"))
      .select(col("grp"), col("n_days"), col("m").as("n_pairs"),
        col("slope_micro"))
  }

  /** Mann-Kendall trend test of each group's daily event counts — the
    * significance companion to [[theilSen]] (the standard pairing:
    * Theil-Sen estimates the slope, Mann-Kendall says whether a monotone
    * trend exists at all, distribution-free). S = Σ_{i<j} sgn(x_j − x_i)
    * over day pairs on the calendar axis; the tie-corrected variance
    * rides the EXACT integer `var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`
    * (= 18·Var S, over tie groups of the daily count value), and the
    * normal-approximation z (with the ±1 continuity correction) is the
    * single mirrored double: `z = (S ∓ 1)/sqrt(var18/18)`, micro-scaled.
    *
    * Scale: identical shape to [[theilSen]] — day-grain pairs generated
    * per group by the renamed-projection self-join, everything else
    * group-grain aggregates; no window at all here. Degenerate var18 = 0
    * (all days equal) → z NULL. Groups with a single day are absent.
    * Output: (grp, n_days, n_pairs, s_stat, var18, z_micro). */
  def mannKendall(events: DataFrame, grpCol: String, tsCol: String): DataFrame = {
    val daily = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
      .select(col("grp"), datediff(col("d"), lit("1970-01-01")).cast("long")
        .as("t"), col("x"))
    val sAgg = daily.select(col("grp"), col("t").as("ti"), col("x").as("xi"))
      .join(daily.select(col("grp"), col("t").as("tj"), col("x").as("xj")),
        Seq("grp"))
      .filter(col("ti") < col("tj"))
      .groupBy(col("grp"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val nDays = daily.groupBy(col("grp")).agg(count(lit(1)).as("n_days"))
    val tie18 = daily.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).as("tt"))
      .groupBy(col("grp"))
      .agg(sum(col("tt") * (col("tt") - 1L) * (lit(2L) * col("tt") + 5L))
        .as("tie18"))
    sAgg.join(nDays, Seq("grp")).join(tie18, Seq("grp"))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1L)
          * (lit(2L) * col("n_days") + 5L) - col("tie18"))
      .select(col("grp"), col("n_days"), col("n_pairs"), col("s_stat"),
        col("var18"),
        expr("""CASE WHEN var18 = 0 THEN CAST(NULL AS BIGINT)
          |WHEN s_stat = 0 THEN 0L
          |ELSE CAST(round(1e6
          |  * (CAST(s_stat AS DOUBLE) - CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)
          |  / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT) END"""
          .stripMargin).as("z_micro"))
  }

  /** Siegel repeated-median slope of each group's daily event counts —
    * [[theilSen]]'s higher-breakdown sibling (Theil-Sen survives ~29%
    * contaminated points; the median-of-medians survives 50%): for each
    * day i take the MEDIAN of its pairwise slopes to every other day,
    * then the median of those per-day medians. Both stages are exact
    * lower-median selections (rank ⌈m/2⌉ by row_number, ties broken on
    * the partner/day axis), each slope one mirrored micro-rounded
    * division — the [[theilSen]] discipline, including the ENFORCED
    * `maxSpanDays` contract on the C(span,2)-shaped pair stage (pairs
    * materialize in both directions here, same asymptotics).
    * Windows: per-(group, day) for stage one, per-group day-grain for
    * stage two — never corpus-grain.
    * Output: (grp, n_days, slope_micro); single-day groups are absent. */
  def siegelSlope(events: DataFrame, grpCol: String, tsCol: String,
      maxSpanDays: Int = 2000): DataFrame = {
    val daily = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
      .select(col("grp"), datediff(col("d"), lit("1970-01-01")).cast("long")
        .as("t"), col("x"))
    val spanRow = daily.groupBy(col("grp"))
      .agg((max(col("t")) - min(col("t")) + 1L).as("span"))
      .agg(max(col("span"))).collect()(0)
    val maxSpan = if (spanRow.isNullAt(0)) 0L else spanRow.getLong(0)
    require(maxSpan <= maxSpanDays,
      s"siegelSlope: a group spans $maxSpan days, past maxSpanDays=" +
        s"$maxSpanDays — C(span, 2) day pairs in one group partition; " +
        "bucket the series to weeks first or raise the bound deliberately")
    val pairs = daily.select(col("grp"), col("t").as("ti"),
        col("x").as("xi"))
      .join(daily.select(col("grp"), col("t").as("tj"), col("x").as("xj")),
        Seq("grp"))
      .filter(col("ti") =!= col("tj"))
      .select(col("grp"), col("ti"), col("tj"),
        expr("CAST(round(1e6 * CAST(xj - xi AS DOUBLE) / (tj - ti)) " +
          "AS BIGINT)").as("slope_micro"))
    val w1 = Window.partitionBy(col("grp"), col("ti"))
      .orderBy(col("slope_micro").asc, col("tj").asc)
    val c1 = Window.partitionBy(col("grp"), col("ti"))
    val perDay = pairs
      .withColumn("rn", row_number().over(w1).cast("long"))
      .withColumn("m", count(lit(1)).over(c1))
      .filter(expr("rn = (m + 1) div 2"))
      .select(col("grp"), col("ti"), col("slope_micro").as("med_i"))
    val w2 = Window.partitionBy(col("grp"))
      .orderBy(col("med_i").asc, col("ti").asc)
    val c2 = Window.partitionBy(col("grp"))
    perDay
      .withColumn("rn", row_number().over(w2).cast("long"))
      .withColumn("m", count(lit(1)).over(c2))
      .filter(expr("rn = (m + 1) div 2"))
      .select(col("grp"), col("m").as("n_days"),
        col("med_i").as("slope_micro"))
  }

  /** Pettitt single-changepoint test of each group's daily event counts —
    * the rank-based "WHEN did the level shift?" companion to [[cusum]]
    * (which needs a known target mean) and [[mannKendall]] (which
    * assumes a monotone drift): `U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j)`,
    * `K = max_t |U_t|`, the argmax is the changepoint candidate, and
    * `p ≈ 2·exp(−6K²/(n³+n²))` is the standard approximation.
    *
    * Exactness without pairs: `U_t − U_{t−1} = Σ_{j≠t} sgn(x_t − x_j)
    * = dr_t − (n+1)` with `dr` the within-group DOUBLED midrank of the
    * day's count ([[graft.operators.Stats]] midrank identity:
    * #less − #greater = dr − n − 1) — so the whole statistic is one
    * value-grain rank window plus one day-grain cumulative sum, BOTH
    * group-partitioned: O(n) per group where the textbook form is
    * O(n²), no span cap needed, all integers exact. K's witness is the
    * smallest t on ties; the max-|U| scan excludes t = n (U_n ≡ 0). The
    * single mirrored double is the exp; p is clamped to 1 before
    * micro-rounding. Single-day groups are absent (no interior split).
    * Output: (grp, n_days, k_stat, t_at, p_micro) — t_at in epoch days. */
  def pettitt(events: DataFrame, grpCol: String, tsCol: String): DataFrame = {
    val daily = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
      .select(col("grp"), datediff(col("d"), lit("1970-01-01")).cast("long")
        .as("t"), col("x"))
    val wv = Window.partitionBy(col("grp")).orderBy(col("x").asc)
    val dmid = daily.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cumb", coalesce(sum(col("c")).over(
        wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("dr", lit(2L) * col("cumb") + col("c") + 1L)
      .select(col("grp"), col("x"), col("dr"))
    val nd = daily.groupBy(col("grp")).agg(count(lit(1)).as("n_days"))
    val wt = Window.partitionBy(col("grp")).orderBy(col("t").asc)
    val u = daily.join(dmid, Seq("grp", "x")).join(nd, Seq("grp"))
      .withColumn("vt", col("dr") - col("n_days") - 1L)
      .withColumn("ut", sum(col("vt")).over(
        wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rnk", row_number().over(wt))
      .filter(col("rnk") < col("n_days"))
    val wk = Window.partitionBy(col("grp"))
      .orderBy(abs(col("ut")).desc, col("t").asc)
    u.withColumn("pick", row_number().over(wk))
      .filter(col("pick") === 1)
      .withColumn("k_stat", abs(col("ut")))
      .select(col("grp"), col("n_days"), col("k_stat"), col("t").as("t_at"),
        expr(
          """CAST(round(1e6 * least(1.0,
            |  2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE) * k_stat
            |    / (CAST(n_days AS DOUBLE) * n_days * n_days
            |       + CAST(n_days AS DOUBLE) * n_days)))) AS BIGINT)"""
            .stripMargin).as("p_micro"))
  }

  /** Ljung-Box portmanteau test on each group's daily-count
    * autocorrelations — "is this series white noise, jointly over the
    * first h lags?", the residual-diagnostics closer that a single
    * [[acf]] spike can't answer (h marginal tests inflate the family
    * error; Q pools them). Composes [[acf]] unchanged:
    * `Q = n(n+2) Σ_{k≤h} r_k²/(n−k)` with each lag's
    * `round(1e9·r_k²/(n−k))` nano-rounded THEN summed (exact longs — a
    * cross-row double sum over the lag rows would be order-dependent),
    * and the closing `q_micro = round(1e6·n(n+2)·Σ/1e9)` the one mirrored
    * double. r_k reads the already-rounded `acf_micro` (deterministic by
    * construction). Groups whose variance is 0 (NULL acf) drop their
    * NULL lags; h_lags records how many lags actually contributed (a
    * span shorter than maxLag yields fewer join rows — visible, not
    * silent). Output: (grp, n_days, h_lags, q_micro).
    *
    * Scale: the lag table is (groups × maxLag) rows — everything heavy
    * already happened inside [[acf]]'s day-grain plan. */
  def ljungBox(events: DataFrame, grpCol: String, tsCol: String,
      maxLag: Int): DataFrame = {
    acf(events, grpCol, tsCol, maxLag)
      .filter(col("acf_micro").isNotNull)
      .withColumn("term_nano", expr(
        """CAST(round(1e9
          |  * (CAST(acf_micro AS DOUBLE) / 1e6)
          |  * (CAST(acf_micro AS DOUBLE) / 1e6)
          |  / (n_days - lag)) AS BIGINT)""".stripMargin))
      .groupBy(col("grp"))
      .agg(max(col("n_days")).as("n_days"),
        count(lit(1)).as("h_lags"),
        sum(col("term_nano")).as("s_nano"))
      .select(col("grp"), col("n_days"), col("h_lags"), expr(
        """CAST(round(1e6 * CAST(n_days AS DOUBLE) * (n_days + 2)
          |  * (CAST(s_nano AS DOUBLE) / 1e9)) AS BIGINT)"""
          .stripMargin).as("q_micro"))
  }

  /** Bounded-kernel exponentially-weighted moving average of each
    * group's daily event counts — the smoothing pass that feeds anomaly
    * thresholds and trend dashboards (recent days dominate, one spike
    * decays geometrically instead of falling off a cliff the way a
    * boxcar mean does). The kernel is TRUNCATED at `window` days
    * (weights below that are < (1−α)^W of the head — numerically dead
    * anyway), which turns the textbook infinite recursion into a
    * day-grain kernel join: densified daily counts (the [[acf]] grid, so
    * a silent gap day counts as 0 rather than stretching the kernel),
    * each day joins its last W days via one exploded offset join, and
    * `y_t = Σ_j w_j·x_{t−j} / Σ_j w_j` normalizes over the weights
    * actually present (series head uses the truncated prefix — the
    * pandas `adjust=True` convention). Weights `w_j = round(1e6·(1−α)^j)`
    * are computed ONCE driver-side by iterated multiplication and enter
    * both engines as the same literal table, so `num = Σ w_j·x` and
    * `den = Σ w_j` are exact longs and the closing
    * `round(1e6·num/den)` is the one mirrored double. Output:
    * (grp, d, x, ewma_micro).
    *
    * Scale: day-grain × window rows per group (span·W, never
    * row-count); the kernel join is co-partitioned on the group. */
  def ewmaDaily(events: DataFrame, grpCol: String, tsCol: String,
      alpha: Double, window: Int): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val wMicro = ewmaWeightsMicro(alpha, window)
    val observed = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
    val daily = observed.groupBy(col("grp"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("grp"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(observed, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("x"), lit(0L)).as("x"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("d"))
    val idx = daily.withColumn("rn", row_number().over(wOrd).cast("long"))
    val wLit = s"array(${wMicro.mkString("L, ")}L)"
    val offs = idx.select(col("grp"), col("rn"),
        posexplode(expr(wLit)).as(Seq("j", "w")))
      .withColumn("rn2", col("rn") - col("j"))
      .filter(col("rn2") >= 1L)
    offs.join(idx.select(col("grp"), col("rn").as("rn2"),
          col("x").as("xl")), Seq("grp", "rn2"))
      .groupBy(col("grp"), col("rn"))
      .agg(sum(col("w") * col("xl")).as("num"), sum(col("w")).as("den"))
      .join(idx, Seq("grp", "rn"))
      .select(col("grp"), col("d"), col("x"),
        expr("CAST(round(1e6 * CAST(num AS DOUBLE) / den) AS BIGINT)")
          .as("ewma_micro"))
  }

  /** The [[ewmaDaily]] kernel, micro-rounded — shared with the oracle
    * generator so both engines read the SAME literal weights (iterated
    * driver-side multiplication, not pow(): libm pow may differ from the
    * JVM's by ULPs and the constants must be bit-identical). */
  def ewmaWeightsMicro(alpha: Double, window: Int): Seq[Long] = {
    val w = Array.ofDim[Double](window)
    w(0) = 1.0
    for (j <- 1 until window) w(j) = w(j - 1) * (1.0 - alpha)
    w.map(x => math.round(x * 1e6)).toSeq
  }

  /** Matrix profile (non-normalized exact variant) of each group's daily
    * counts: for every length-`m` window, the SQUARED Euclidean distance
    * to its nearest non-trivial neighbor window and that neighbor's
    * position — the all-pairs motif/discord primitive (a window whose
    * profile value spikes matches nothing else in the series = discord /
    * anomaly; a near-zero value = repeated motif). Distances stay on the
    * RAW count subsequences (every term an exact long), the documented
    * deviation from the z-normalized textbook profile — normalization
    * divides by per-window σ, which both breaks integer exactness and
    * explodes on flat windows; for count series the raw-amplitude match
    * is usually what the anomaly question means anyway. Trivial matches
    * are excluded the standard way: |i − j| must exceed `exclusion`
    * (default ⌊m/2⌋).
    *
    * Plan: the [[acf]] densified day grid (a gap day is a real zero, not
    * a splice), window elements by ONE exploded offset join (day-grain ×
    * m rows), pair distances by a per-group equi-join on the offset
    * (C(span, 2)·m terms — day-grain quadratic, ENFORCED by the
    * [[theilSen]] `maxSpanDays` gate because one group's span is exactly
    * the partition that would blow up), then one symmetric union and an
    * argmin struct-min per window (deterministic tie: smallest
    * neighbor), LEFT-joined back onto the full window list so a window
    * with no non-trivial neighbor (a group whose span yields fewer than
    * `excl + 2` windows) still gets its row, with NULL p_dist/nn_idx —
    * "no neighbor" must read differently from "no window". Nothing is
    * row-count-grain. Output: (grp, d, win_start, p_dist, nn_idx) for
    * EVERY window start day d at index win_start. */
  def matrixProfile(events: DataFrame, grpCol: String, tsCol: String,
      m: Int, exclusion: Int = -1, maxSpanDays: Int = 2000): DataFrame = {
    require(m >= 2, s"window m must be >= 2, got $m")
    val excl = if (exclusion >= 0) exclusion else m / 2
    val observed = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
    val spanRow = observed.groupBy(col("grp"))
      .agg((datediff(max(col("d")), min(col("d"))) + 1L).as("span"))
      .agg(max(col("span"))).collect()(0)
    val maxSpan = if (spanRow.isNullAt(0)) 0L else spanRow.getLong(0)
    require(maxSpan <= maxSpanDays,
      s"matrixProfile: a group spans $maxSpan days, past maxSpanDays=" +
        s"$maxSpanDays — C(span, 2) window pairs in one group " +
        "partition; bucket to weeks first or raise the bound deliberately")
    val daily = observed.groupBy(col("grp"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("grp"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(observed, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("x"), lit(0L)).as("x"))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("d"))
    val wAll = Window.partitionBy(col("grp"))
    val idx = daily
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    val wins = idx.select(col("grp"), col("rn"), col("n"),
        explode(expr(s"sequence(0L, ${m - 1}L)")).as("t"))
      .withColumn("rn2", col("rn") + col("t"))
      .filter(col("rn") <= col("n") - (m - 1))
      .join(idx.select(col("grp"), col("rn").as("rn2"), col("x").as("v")),
        Seq("grp", "rn2"))
      .select(col("grp"), col("rn").as("i"), col("t"), col("v"))
    val ordered = wins.join(
        wins.select(col("grp"), col("i").as("j"), col("t"),
          col("v").as("vj")),
        Seq("grp", "t"))
      .filter(col("j") > col("i") + excl)
      .groupBy(col("grp"), col("i"), col("j"))
      .agg(sum((col("v") - col("vj")) * (col("v") - col("vj"))).as("dist"))
    val sym = ordered.select(col("grp"), col("i"), col("j"), col("dist"))
      .union(ordered.select(col("grp"), col("j").as("i"),
        col("i").as("j"), col("dist")))
    val prof = sym.groupBy(col("grp"), col("i"))
      .agg(min(struct(col("dist"), col("j"))).as("nn"))
      .select(col("grp"), col("i").as("win_start"),
        col("nn.dist").as("p_dist"), col("nn.j").as("nn_idx"))
    idx.filter(col("rn") <= col("n") - (m - 1))
      .select(col("grp"), col("rn").as("win_start"), col("d"))
      .join(prof, Seq("grp", "win_start"), "left")
      .select(col("grp"), col("d"), col("win_start"), col("p_dist"),
        col("nn_idx"))
  }

  /** Wald-Wolfowitz runs test on each group's daily counts: is the
    * above/below-median pattern RANDOM in time, or does it cluster
    * (trend, regime) / alternate (overdispersion)? — the randomness gate
    * next to [[TimeSeries.acf]] that catches serial structure a
    * stationarity test ignores. Days score +1 above / −1 below the
    * group's LOWER-median daily count (the exact order statistic, the
    * brownForsythe discipline); days AT the median drop per the textbook
    * treatment. The run count is one lag window over the surviving
    * day-grain rows; `z = (R − μ)/σ` with `μ = 2·n₊·n₋/n + 1`,
    * `σ² = 2n₊n₋(2n₊n₋ − n)/(n²(n−1))`, every moment an exact long and
    * the closing division the one mirrored double, micro-rounded at
    * scale 0 (fractional-scale round() is the one op the engines
    * disagree on at half-ties — the resampleInterp lesson, hit live by
    * this operator's first verify). Degenerates: all days on one side
    * (σ = 0) or n < 2 → NULL z. Output: (grp, n_days, n_plus, n_minus,
    * n_runs, z_micro). Everything is day-grain under the group
    * partition — no corpus-grain stage at any scale. */
  def runsTest(events: DataFrame, grpCol: String, tsCol: String): DataFrame = {
    val observed = events.select(col(grpCol).as("grp"),
        to_date(col(tsCol)).as("d"))
      .groupBy(col("grp"), col("d"))
      .agg(count(lit(1)).as("x"))
    val daily = observed.groupBy(col("grp"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("grp"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(observed, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("x"), lit(0L)).as("x"))
    val wgv = Window.partitionBy(col("grp")).orderBy(col("x").asc)
    val med = daily.groupBy(col("grp"), col("x")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        wgv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nd", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .filter(col("cum") * 2 >= col("nd"))
      .groupBy(col("grp")).agg(min(col("x")).as("med"))
    val signed = daily.join(med, Seq("grp"))
      .filter(col("x") =!= col("med"))
      .withColumn("s", when(col("x") > col("med"), 1L).otherwise(-1L))
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("d"))
    signed
      .withColumn("brk",
        when(lag(col("s"), 1).over(wOrd).isNull
          || lag(col("s"), 1).over(wOrd) =!= col("s"), 1L).otherwise(0L))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("s") === 1L, 1L).otherwise(0L)).as("n_plus"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).as("n_minus"),
        sum(col("brk")).as("n_runs"))
      .select(col("grp"), col("n_days"), col("n_plus"), col("n_minus"),
        col("n_runs"), expr(
        // 2.0D, not 2.0: Spark parses a bare decimal literal as DECIMAL
        // and decimal-scale division diverges from the oracle's double
        // path by far more than an ULP (hit live at this operator's
        // first verify: z off in the 6th decimal)
        """CASE WHEN n_days < 2 OR n_plus = 0 OR n_minus = 0
          |    OR 2.0D * n_plus * n_minus
          |       * (2.0D * n_plus * n_minus - n_days) <= 0.0D
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(round(1e6 * (CAST(n_runs AS DOUBLE)
          |      - (2.0D * n_plus * n_minus / n_days + 1.0D))
          |    / sqrt(2.0D * n_plus * n_minus
          |        * (2.0D * n_plus * n_minus - n_days)
          |        / (CAST(n_days AS DOUBLE) * n_days * (n_days - 1))))
          |    AS BIGINT)
          |  END""".stripMargin).as("z_micro"))
  }
}
