package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface over the TPC-H-ish testdata: aggregation
  * (hash/partial+final, distinct, rollup/cube), joins (shuffle hash/SMJ,
  * broadcast, semi, anti, range/theta, as-of), windows, top-k, set ops.
  *
  * All of these compile to plain Catalyst plans — predicate pushdown, column
  * pruning, partial aggregation, AQE join selection are free. Doubles that
  * survive aggregation are rounded in BOTH engines so last-ulp summation
  * order differences cannot flip the driver's hash compare.
  */
object Relational {
  import Tables.t

  def defs: Seq[Q] = Seq(
    // ---- aggregation family -------------------------------------------
    Q("q1_agg", (s, d) => {
      // NOT spread (measured): the 1-task partial aggregate over cheap
      // per-row arithmetic beats paying a full-width row shuffle first
      // (isolated 0.33 s unspread vs 1.17 s spread at sf0.1)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q2_filter_project", (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_quantity") > 25)
        // no round(): row-level IEEE products are bit-identical across
        // engines, while round() half-ties on exact 4-decimal values differ
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1 - l_discount) AS revenue
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 25""")),

    Q("q3_join_agg", (s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_mktsegment"))
        .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .withColumnRenamed("c_mktsegment", "segment")
    }, Some("""
      SELECT c_mktsegment AS segment,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    Q("q4_broadcast_join", (s, d) => {
      val l = t(s, d, "lineitem"); val p = t(s, d, "part")
      // part is a dimension table: broadcast so lineitem never shuffles
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(p("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(avg(l("l_extendedprice")), 2).as("avg_price"))
        .withColumnRenamed("p_brand", "brand")
    }, Some("""
      SELECT p_brand AS brand, count(*) AS n,
             round(avg(l_extendedprice), 2) AS avg_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand""")),

    Q("q5_multi_join", (s, d) => {
      val r = t(s, d, "region"); val n = t(s, d, "nation")
      val c = t(s, d, "customer"); val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"), n("n_name"))
        .agg(round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 2).as("revenue"))
        .withColumnRenamed("r_name", "region_name")
        .withColumnRenamed("n_name", "nation_name")
    }, Some("""
      SELECT r_name AS region_name, n_name AS nation_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""")),

    Q("q6_semi_join", (s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val big = o.filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumnRenamed("c_mktsegment", "segment")
    }, Some("""
      SELECT c_mktsegment AS segment, count(*) AS n_customers
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      GROUP BY c_mktsegment""")),

    Q("q7_anti_join", (s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val big = o.filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(c("c_custkey"), c("c_mktsegment").as("segment"))
    }, Some("""
      SELECT c_custkey, c_mktsegment AS segment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""")),

    // ---- window family -------------------------------------------------
    Q("q8_window_rank", (s, d) => {
      val o = t(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn <= 3""")),

    Q("q9_window_running", (s, d) => {
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_quantity")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_qty"),
          lag(col("l_quantity"), 1).over(ord).as("prev_qty"))
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
             lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty
      FROM lineitem WHERE l_suppkey < 10""")),

    // ---- sort / top-k / set ops ---------------------------------------
    Q("q10_topk", (s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("total"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice AS total
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    Q("q11_intersect", (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(
          o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    }, Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    Q("q12_except", (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
        .except(
          o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    }, Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    Q("q13_union_all", (s, d) => {
      val o = t(s, d, "orders")
      // unionByName = the reference's columnar concat (UNION ALL) semantics
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"))
        .unionByName(o.filter(col("o_orderstatus") =!= "O")
          .select(col("o_orderkey"), col("o_custkey")))
    }, Some("""
      SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus <> 'O'""")),

    // ---- grouping sets / distinct -------------------------------------
    Q("q14_rollup", (s, d) => {
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .withColumnRenamed("o_orderstatus", "status")
        .withColumnRenamed("o_orderpriority", "priority")
    }, Some("""
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    Q("q15_cube", (s, d) => {
      // NOT spread (measured): the Expand rows are narrow (2 group cols)
      // and the map-side combine collapses them — 0.43 s unspread vs
      // 0.79 s spread at sf0.1. Spread pays only for EXPENSIVE per-row
      // work, not row-count blow-ups the combiner absorbs.
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .withColumnRenamed("l_returnflag", "rflag")
        .withColumnRenamed("l_linestatus", "lstatus")
    }, Some("""
      SELECT l_returnflag AS rflag, l_linestatus AS lstatus, count(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    Q("q16_distinct_agg", (s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .withColumnRenamed("l_returnflag", "rflag")
    }, Some("""
      SELECT l_returnflag AS rflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag""")),

    Q("q17_having", (s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") >= 20)
    }, Some("""
      SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 20""")),

    // ---- range / theta / as-of joins ----------------------------------
    Q("q18_range_join", (s, d) => {
      val e = Tables.events(s, d)
      // small derived band table — broadcast nested-loop range join
      val bands = s.range(0, 8).select(
        (col("id") * 5.0).as("lo"), ((col("id") + 1) * 5.0).as("hi"))
      e.join(broadcast(bands), e("value") >= bands("lo") && e("value") < bands("hi"))
        .groupBy(bands("lo"))
        .agg(count(lit(1)).as("n"), round(avg(e("value")), 4).as("avg_value"))
    }, Some("""
      SELECT lo, count(*) AS n, round(avg(value), 4) AS avg_value
      FROM events JOIN (SELECT i*5.0 AS lo, (i+1)*5.0 AS hi FROM range(0,8) t(i))
        ON value >= lo AND value < hi
      GROUP BY lo""")),

    Q("q19_asof_join", (s, d) => {
      val e = Tables.events(s, d)
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsOfJoin.joinBackward(
        e.select(col("event_id"), col("user_id"), col("ts")), o,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTs = "ts", rightTs = "o_orderdate",
        rightValues = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"))
    }, Some("""
      SELECT event_id, o.o_orderkey AS o_orderkey
      FROM events e ASOF LEFT JOIN
        (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
         FROM orders GROUP BY o_custkey, o_orderdate) o
        ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate""")),

    Q("q33_asof_forward", (s, d) => {
      val e = Tables.events(s, d)
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsOfJoin.joinForward(
        e.select(col("event_id"), col("user_id"), col("ts")), o,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTs = "ts", rightTs = "o_orderdate",
        rightValues = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"))
    }, Some("""
      SELECT event_id, o.o_orderkey AS o_orderkey
      FROM events e ASOF LEFT JOIN
        (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
         FROM orders GROUP BY o_custkey, o_orderdate) o
        ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) <= o.o_orderdate""")))
}
