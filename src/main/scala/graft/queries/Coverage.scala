package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.{HashExprs => H}

/** Round-2 query-surface widening: grouping sets, RANGE window frames,
  * correlated scalar subqueries, quantile binning, positional window
  * functions, sessionization, sliding event-time windows, PII scrubbing,
  * and stratified deterministic sampling.
  *
  * Scale notes: every query here is a single hash-shuffle (or pure
  * projection) plan — no cartesians, no driver-side loops. Sessionization is
  * the classic lag+cumsum formulation (one window shuffle per user key);
  * sliding windows fan each row out to exactly windowLen/slide buckets.
  */
object Coverage {
  import Tables.t

  /** The q77/q79 SCD2 demo dimension: a customer snapshot plus closed
    * history, merged with a batch of changed balances, no-op
    * re-deliveries, and brand-new keys (deterministic, mirrored verbatim
    * by both queries' oracle CTEs). */
  private def scd2Current(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val snap = c
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val hist = c.filter(col("c_custkey") % 4 === 0)
      .withColumn("c_acctbal", col("c_acctbal") - 50.0)
      .withColumn("valid_from", to_date(lit("2023-01-01")))
      .withColumn("valid_to", to_date(lit("2024-01-01")))
      .withColumn("is_current", lit(false))
    snap.unionByName(hist)
  }

  private def scd2Merged(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val updates = c.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .unionByName(
        c.filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 3 =!= 0))
      .unionByName(c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_acctbal"), lit("NEW").as("c_mktsegment")))
    graft.operators.Scd2.merge(scd2Current(s, d), updates,
      Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"), "2024-06-01")
  }

  /** The q80 multi-version SCD2 batch: per-key ordered change SEQUENCES —
    * two-step balance changes, an exact redelivery duplicate, a pure
    * no-op version, a flip-and-revert pair, and brand-new keys arriving
    * with two versions in the same batch (deterministic, mirrored
    * verbatim by the oracle CTE). */
  private def scd2MultiMerged(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    def ver(df: org.apache.spark.sql.DataFrame, ts: String) =
      df.withColumn("ts", to_date(lit(ts)))
    val m3a = ver(c.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0), "2024-03-01")
    val m3b = ver(c.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 200.0), "2024-06-01")
    val noop = ver(c.filter(col("c_custkey") % 5 === 0 &&
      col("c_custkey") % 3 =!= 0), "2024-04-01")
    val flipKeys = c.filter(col("c_custkey") % 7 === 0 &&
      col("c_custkey") % 3 =!= 0 && col("c_custkey") % 5 =!= 0)
    val flip = ver(flipKeys.withColumn("c_mktsegment", lit("FLIP")),
      "2024-02-01")
    val revert = ver(flipKeys, "2024-05-01")
    val fresh = c.filter(col("c_custkey") % 11 === 0)
      .select((col("c_custkey") + 2000000L).as("c_custkey"),
        col("c_acctbal"), lit("NEW").as("c_mktsegment"))
    val updates = m3a.unionByName(m3b).unionByName(noop)
      .unionByName(flip).unionByName(revert)
      .unionByName(ver(fresh, "2024-03-15"))
      .unionByName(ver(fresh.withColumn("c_acctbal", col("c_acctbal") + 5.0),
        "2024-09-15"))
      .unionByName(m3a) // at-least-once redelivery: exact duplicate rows
    graft.operators.Scd2.mergeVersions(scd2Current(s, d), updates,
      Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"), "ts")
  }

  /** The q75/q78 funnel oracle: the same greedy per-step min-aggregate
    * chain as `EventAnalytics.funnel`, with the conversion-window conjunct
    * added when `gapUs` is set — generated so the two queries can't drift
    * apart on the step list or the recurrence. */
  // private[queries]: q81 (ScaleOps) replays the stream against the SAME
  // chained min-aggregate oracle, so the three implementations can't drift
  private[queries] def funnelOracleSql(gapUs: Option[Long]): String = {
    val steps = Seq("signup", "view", "click", "purchase")
    val ctes = steps.zipWithIndex.map {
      case (st, 0) =>
        s"s1 AS (SELECT u, min(us) AS t FROM e WHERE et = '$st' GROUP BY u)"
      case (st, i) =>
        val w = gapUs.map(g => s" AND e.us <= s$i.t + $g").getOrElse("")
        s"""s${i + 1} AS (SELECT e.u, min(e.us) AS t FROM e JOIN s$i ON e.u = s$i.u
             AND e.us > s$i.t$w WHERE e.et = '$st' GROUP BY e.u)"""
    }
    val selects = steps.zipWithIndex.map {
      case (st, 0) =>
        s"""SELECT CAST(1 AS BIGINT) AS step_idx, '$st' AS step,
             count(*) AS n_users FROM s1"""
      case (st, i) => s"SELECT ${i + 1}, '$st', count(*) FROM s${i + 1}"
    }.mkString("\n      UNION ALL ")
    s"""
      WITH e AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                        event_type AS et FROM events),
      ${ctes.mkString(",\n      ")}
      $selects"""
  }

  /** The q77 oracle body, shared with q79 (which wraps it in a CTE). */
  private val scd2OracleSql = """
      WITH c AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
      cur AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
               true AS is_current FROM c
        UNION ALL
        SELECT c_custkey, c_acctbal - 50.0, c_mktsegment,
               DATE '2023-01-01', DATE '2024-01-01', false
        FROM c WHERE c_custkey % 4 = 0),
      upd AS (
        SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        FROM c WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, c_mktsegment
        FROM c WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_acctbal, 'NEW'
        FROM c WHERE c_custkey % 7 = 0),
      live AS (SELECT * FROM cur WHERE is_current),
      chg AS (
        SELECT u.* FROM upd u LEFT JOIN live l ON u.c_custkey = l.c_custkey
        WHERE l.c_custkey IS NULL
           OR u.c_acctbal IS DISTINCT FROM l.c_acctbal
           OR u.c_mktsegment IS DISTINCT FROM l.c_mktsegment),
      k AS (SELECT DISTINCT c_custkey FROM chg)
      SELECT cur.c_custkey, cur.c_acctbal, cur.c_mktsegment, cur.valid_from,
             CASE WHEN cur.is_current AND k.c_custkey IS NOT NULL
                  THEN DATE '2024-06-01' ELSE cur.valid_to END AS valid_to,
             CASE WHEN cur.is_current AND k.c_custkey IS NOT NULL
                  THEN false ELSE cur.is_current END AS is_current
      FROM cur LEFT JOIN k ON cur.c_custkey = k.c_custkey
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment, DATE '2024-06-01',
             CAST(NULL AS DATE), true
      FROM chg"""

  /** The q80 oracle: DuckDB unroll of [[graft.operators.Scd2.mergeVersions]]
    * — DISTINCT collapses redeliveries, a lag window reads the state in
    * effect before each version (live row for the first, previous version
    * after), a lead window chains valid_from/valid_to, and the live row
    * closes at the key's first transition date. */
  private val scd2MultiOracleSql = """
      WITH c AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
      cur AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
               true AS is_current FROM c
        UNION ALL
        SELECT c_custkey, c_acctbal - 50.0, c_mktsegment,
               DATE '2023-01-01', DATE '2024-01-01', false
        FROM c WHERE c_custkey % 4 = 0),
      upd AS (
        SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment,
               DATE '2024-03-01' AS ts FROM c WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 200.0, c_mktsegment, DATE '2024-06-01'
        FROM c WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, c_mktsegment, DATE '2024-04-01'
        FROM c WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey, c_acctbal, 'FLIP', DATE '2024-02-01'
        FROM c WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0 AND c_custkey % 5 <> 0
        UNION ALL
        SELECT c_custkey, c_acctbal, c_mktsegment, DATE '2024-05-01'
        FROM c WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0 AND c_custkey % 5 <> 0
        UNION ALL
        SELECT c_custkey + 2000000, c_acctbal, 'NEW', DATE '2024-03-15'
        FROM c WHERE c_custkey % 11 = 0
        UNION ALL
        SELECT c_custkey + 2000000, c_acctbal + 5.0, 'NEW', DATE '2024-09-15'
        FROM c WHERE c_custkey % 11 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0, c_mktsegment, DATE '2024-03-01'
        FROM c WHERE c_custkey % 3 = 0),
      u AS (SELECT DISTINCT * FROM upd),
      live AS (SELECT * FROM cur WHERE is_current),
      seq AS (
        SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment, u.ts,
          row_number() OVER w AS rn,
          lag(u.c_acctbal) OVER w AS lag_bal,
          lag(u.c_mktsegment) OVER w AS lag_seg,
          l.c_acctbal AS cur_bal, l.c_mktsegment AS cur_seg,
          l.c_custkey IS NOT NULL AS has_live
        FROM u LEFT JOIN live l ON u.c_custkey = l.c_custkey
        WINDOW w AS (PARTITION BY u.c_custkey ORDER BY u.ts)),
      tr AS (
        SELECT c_custkey, c_acctbal, c_mktsegment, ts FROM (
          SELECT *,
            CASE WHEN rn = 1 THEN cur_bal ELSE lag_bal END AS prev_bal,
            CASE WHEN rn = 1 THEN cur_seg ELSE lag_seg END AS prev_seg
          FROM seq)
        WHERE (rn = 1 AND NOT has_live)
           OR c_acctbal IS DISTINCT FROM prev_bal
           OR c_mktsegment IS DISTINCT FROM prev_seg),
      ins AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
          ts AS valid_from,
          lead(ts) OVER w AS valid_to,
          lead(ts) OVER w IS NULL AS is_current
        FROM tr WINDOW w AS (PARTITION BY c_custkey ORDER BY ts)),
      marks AS (SELECT c_custkey, min(ts) AS chg FROM tr GROUP BY 1)
      SELECT cur.c_custkey, cur.c_acctbal, cur.c_mktsegment, cur.valid_from,
        CASE WHEN cur.is_current AND m.c_custkey IS NOT NULL
             THEN m.chg ELSE cur.valid_to END AS valid_to,
        CASE WHEN cur.is_current AND m.c_custkey IS NOT NULL
             THEN false ELSE cur.is_current END AS is_current
      FROM cur LEFT JOIN marks m ON cur.c_custkey = m.c_custkey
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to,
             is_current FROM ins"""

  def defs: Seq[Q] = Seq(

    // GROUPING SETS — finer than rollup/cube (q14/q15): an explicit lattice.
    // NULL group markers are coalesced to sentinels so the hash compare
    // can't confuse "grouped-out" with a genuinely NULL key.
    Q("q36_grouping_sets", (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT coalesce(l_returnflag, '*') AS rflag,
               coalesce(l_linestatus, '*') AS lstatus,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    }, Some("""
      SELECT coalesce(l_returnflag, '*') AS rflag,
             coalesce(l_linestatus, '*') AS lstatus,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    // RANGE window frame over integer epoch-days: a 30-day trailing revenue
    // sum per customer — value-based frames are the other half of the window
    // surface (q9 covered ROWS frames). Money is summed as EXACT integer
    // cents: engines combine sliding-frame sums in different orders
    // (re-accumulation vs segment trees), so float sums are a last-ulp hash
    // hazard; integer sums are order-independent.
    Q("q37_range_frame", (s, d) => {
      val o = t(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od"))
        .rangeBetween(-30, 0)
      o.select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("od"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("trailing_30d_cents", sum(col("cents")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("trailing_30d_cents"))
    }, Some("""
      SELECT o_orderkey, o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_30d_cents
      FROM orders""")),

    // correlated scalar subquery — Catalyst decorrelates it to an agg+join;
    // the query surface (not the plan) is what's being covered
    Q("q38_correlated_subquery", (s, d) => {
      t(s, d, "part").createOrReplaceTempView("part_corr")
      s.sql("""
        SELECT p_partkey, p_brand, p_retailprice
        FROM part_corr p1
        WHERE p_retailprice > 1.2 * (SELECT avg(p_retailprice)
                                     FROM part_corr p2
                                     WHERE p2.p_brand = p1.p_brand)""")
    }, Some("""
      SELECT p_partkey, p_brand, p_retailprice
      FROM part p1
      WHERE p_retailprice > 1.2 * (SELECT avg(p_retailprice)
                                   FROM part p2
                                   WHERE p2.p_brand = p1.p_brand)""")),

    // ntile quantile binning (deterministic: total order via custkey
    // tiebreak). The rank rides the GlobalRank sharded ntile — the
    // 2-decimal balance maps monotonically+injectively to integer cents,
    // so the (cents, custkey) order IS the (balance, custkey) order and
    // the deciles are bit-identical to the one-task window's, without a
    // single-partition WindowExec at corpus grain.
    Q("q39_ntile", (s, d) => {
      graft.operators.GlobalRank.withNtile(
        t(s, d, "customer").withColumn("__cents",
          expr("CAST(round(c_acctbal * 100) AS BIGINT)")),
        col("__cents"), asc = true, col("c_custkey"), 10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
    }, Some("""
      WITH deciles AS (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
        FROM customer)
      SELECT decile, count(*) AS n,
             min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
      FROM deciles GROUP BY decile""")),

    // positional window functions: first/last/nth over an unbounded frame
    Q("q40_first_last", (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderpriority").as("priority"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .distinct()
    }, Some("""
      SELECT DISTINCT o_orderpriority AS priority,
        first_value(o_orderkey) OVER w AS first_key,
        last_value(o_orderkey) OVER w AS last_key,
        nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // sessionization: a session breaks after >30 min of per-user silence —
    // lag + cumulative-sum-of-breaks, the batch analog of session_window
    // (whose streaming form is covered in StreamingSpec)
    Q("q41_sessionize", (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(byUser) > 1800L * 1000000L
            || lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("brk")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    }, Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      flagged AS (
        SELECT user_id, event_id, us,
          CASE WHEN us - lag(us) OVER w > 1800 * 1000000
                 OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
      sessions AS (
        SELECT user_id, us,
          CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, count(*) AS n_events,
             min(us) AS start_us, max(us) AS end_us
      FROM sessions GROUP BY user_id, session_idx""")),

    // sliding event-time window (12h length, 6h slide): each event lands in
    // exactly two epoch-aligned windows — the batch form of the streaming
    // sliding-window aggregation
    Q("q42_sliding_window", (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "12 hours", "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n")),
      Some("""
        WITH fanout AS (
          SELECT unnest([time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)),
                         time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) - INTERVAL 6 HOUR])
                   AS window_start,
                 event_type
          FROM events)
        SELECT window_start, event_type, count(*) AS n
        FROM fanout GROUP BY 1, 2""")),

    // PII scrubbing: global regexp redaction (emails, then digit runs) with
    // per-doc redaction counts — the quality-gate shape of corpus cleaning
    Q("text_pii_scrub", (s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+', 0)) AS BIGINT)")
          .as("n_emails"),
        regexp_replace(
          regexp_replace(col("text"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
          "[0-9]+", "<NUM>").as("scrubbed")),
      Some("""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
               regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                              '[0-9]+', '<NUM>', 'g') AS scrubbed
        FROM documents""")),

    // ordered string aggregation (deterministic: explicit sort before concat)
    Q("q43_string_agg", (s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey").as("regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n")),
      Some("""
        SELECT n_regionkey AS regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n
        FROM nation GROUP BY n_regionkey""")),

    // argmin/argmax aggregates (min_by/max_by). Ties on acctbal exist at
    // sf0.1, so the ordering key packs (cents, custkey) into one BIGINT —
    // exact integer math, deterministic in both engines (DuckDB's arg_min
    // accepts only scalar keys)
    Q("q44_minmax_by", (s, d) => {
      val key = (expr("CAST(round(c_acctbal * 100) AS BIGINT)") * 10000000L
        + col("c_custkey"))
      t(s, d, "customer")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(min_by(col("c_custkey"), key).as("poorest_key"),
          max_by(col("c_custkey"), key).as("richest_key"))
    }, Some("""
      SELECT c_mktsegment AS segment,
             arg_min(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS poorest_key,
             arg_max(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS richest_key
      FROM customer GROUP BY c_mktsegment""")),

    // IN-subquery with NULLs in the value list — three-valued logic makes
    // this a classic engine-divergence trap (NULL members must not match,
    // and must not turn IN into UNKNOWN for present members)
    Q("q47_in_subquery", (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_in")
      t(s, d, "orders").createOrReplaceTempView("orders_in")
      s.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer_in
        WHERE c_custkey IN (SELECT CASE WHEN o_totalprice > 400000
                                        THEN o_custkey END
                            FROM orders_in)""")
    }, Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE c_custkey IN (SELECT CASE WHEN o_totalprice > 400000
                                      THEN o_custkey END
                          FROM orders)""")),

    // multiset set-ops (ALL variants keep duplicates — q11/q12 cover the
    // distinct forms): customers seen as order-placers twice vs once
    Q("q46_setops_all", (s, d) => {
      val o = t(s, d, "orders")
      val highPri = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val bigVal = o.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey"))
      highPri.intersectAll(bigVal).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_both"))
    }, Some("""
      SELECT o_custkey, count(*) AS n_both FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      GROUP BY o_custkey""")),

    // map-type construction + access + introspection (the MapType third of
    // the complex-type surface; arrays are covered by q26/q32, structs by
    // the flattener)
    Q("q45_map_funcs", (s, d) => {
      val m = map(lit("status"), col("o_orderstatus"),
        lit("priority"), col("o_orderpriority"))
      t(s, d, "orders").select(col("o_orderkey"),
        element_at(m, "status").as("status"),
        size(map_keys(m)).cast("long").as("n_keys"),
        concat_ws(",", sort_array(map_keys(m))).as("keys_sorted"))
    }, Some("""
      SELECT o_orderkey,
             list_extract(map_extract(m, 'status'), 1) AS status,
             cardinality(m) AS n_keys,
             array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
      FROM (SELECT o_orderkey,
              map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
            FROM orders)""")),

    // stratified deterministic sampling: per-language keep rates, membership
    // a pure function of content hash — reproducible on any cluster/run,
    // unlike random() sampling (same property as text_sample, per stratum)
    Q("text_stratified", (s, d) =>
      t(s, d, "documents")
        .filter(TextAnalysis.fingerprint("text") % 100 <
          when(col("lang") === "en", 50).otherwise(10))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled")),
      Some(s"""
        SELECT lang, count(*) AS n_sampled
        FROM documents
        WHERE ${H.duckCharHash("text")} % 100 <
              CASE WHEN lang = 'en' THEN 50 ELSE 10 END
        GROUP BY lang""")),

    // bucketed co-located join: both fact tables are written bucketed+sorted
    // on the join key, so the SMJ (forced via merge hint — at oracle scale
    // the optimizer would otherwise broadcast) reads pre-partitioned,
    // pre-sorted buckets with NO exchange and NO sort on either side; the
    // only shuffle left is the final groupBy. Result must equal the plain
    // join byte-for-byte — DistributionSpec asserts the no-exchange plan
    // shape on this exact query. Money summed as exact integer cents
    // (order-independent across engines).
    Q("q48_bucketed_join", (s, d) => {
      import graft.operators.Distribution
      Distribution.writeBucketed(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
        "graft_l_bkt", Seq("l_orderkey"), 8)
      Distribution.writeBucketed(
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        "graft_o_bkt", Seq("o_orderkey"), 8)
      s.table("graft_l_bkt").hint("merge")
        .join(s.table("graft_o_bkt").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("rev_cents"))
    }, Some("""
      SELECT year(o_orderdate) AS yr, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1""")),

    // ordered event funnel: per-step distinct-user counts under the
    // strict-order chain t_i = min ts of step i AFTER the user's earliest
    // completion of step i-1 — the oracle mirrors the same greedy
    // recurrence as chained per-user min-aggregates
    Q("q75_funnel", (s, d) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase")),
    Some(funnelOracleSql(None))),

    // windowed funnel: same greedy chain with a conversion window — each
    // step must land within 1 day of the previous step's earliest chain
    // completion (deterministic anchor; stricter than "exists a chain
    // with every gap <= g" — see the funnel scaladoc)
    Q("q78_funnel_window", (s, d) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"),
        maxGapMicros = Some(86400000000L)),
    Some(funnelOracleSql(Some(86400000000L)))),

    // cohort retention: 7-day buckets relative to a fixed origin (pure
    // integer week arithmetic — no engine-specific week truncation);
    // (user, week) is distinct before the cohort join so counts are
    // distinct users by construction
    Q("q76_retention", (s, d) =>
      graft.operators.EventAnalytics.retention(Tables.events(s, d),
        "user_id", "ts", "2024-01-01"),
    Some("""
      WITH uw AS (SELECT DISTINCT user_id AS u,
              CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
                AS BIGINT) AS wk
            FROM events WHERE ts IS NOT NULL),
      c AS (SELECT u, min(wk) AS cohort_wk FROM uw GROUP BY u)
      SELECT c.cohort_wk, uw.wk - c.cohort_wk AS wk_offset,
             count(*) AS n_users
      FROM uw JOIN c ON uw.u = c.u
      GROUP BY 1, 2""")),

    // first-order Markov transition matrix over per-user event sequences:
    // consecutive-event pairs by (ts, event_id) — a total order, so the
    // lag is deterministic — counted onto the bounded |event types|² key
    // space with row-conditional probabilities. One window pass over the
    // log, one hash aggregate; the result is bounded regardless of log
    // size.
    Q("q82_transitions", (s, d) =>
      graft.operators.EventAnalytics.transitionMatrix(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id"),
    Some("""
      WITH seq AS (SELECT user_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
            FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      c AS (SELECT prev, event_type AS next, count(*) AS n
            FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
      SELECT prev, next, n,
             round(n / sum(n) OVER (PARTITION BY prev), 6) AS p
      FROM c""")),

    // SCD type-2 merge: fold an update batch (changed balances, no-op
    // re-deliveries, brand-new keys) into a history-tracked dimension.
    // Both engines build the same deterministic current/updates frames
    // from `customer`, so the oracle mirrors the merge row-for-row.
    Q("q77_scd2", (s, d) => scd2Merged(s, d), Some(scd2OracleSql)),

    // point-in-time dimension snapshot over the merged SCD2 history:
    // as of 2024-07-01 the closed rows are out, the merge's inserts are
    // in, untouched live rows carry through - a pure pushed-down filter
    Q("q79_scd2_snapshot", (s, d) =>
      graft.operators.Scd2.snapshotAt(scd2Merged(s, d), "2024-07-01"),
    Some(s"""
      WITH merged AS ($scd2OracleSql)
      SELECT * FROM merged
      WHERE valid_from <= DATE '2024-07-01'
        AND (valid_to IS NULL OR valid_to > DATE '2024-07-01')""")),

    // multi-version SCD2 merge: ONE batch carrying ordered change
    // SEQUENCES per key — two-step balance changes, a flip-and-revert
    // pair, no-op and redelivered versions, brand-new keys arriving with
    // two versions — folded so exactly one history row lands per real
    // transition, chained valid_from -> valid_to. The oracle unrolls the
    // identical lag-collapse / lead-chain with SQL windows.
    Q("q80_scd2_multiversion", (s, d) => scd2MultiMerged(s, d),
      Some(scd2MultiOracleSql))
  )
}
