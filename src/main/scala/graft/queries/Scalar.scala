package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.Flattener

/** Scalar-function surface: string, date/time, math, JSON, conditional and
  * null-handling functions — all Catalyst built-ins (codegen'd, pushdown-
  * transparent). Includes the loader's projection operators expressed as
  * queries: record flattening (via [[graft.schema.Flattener]]) and
  * extra-fields injection, so the loader path itself is oracle-checked.
  *
  * Float discipline: raw row-level arithmetic only (bit-identical across
  * engines); transcendentals (`ln`) rounded to 6 decimals; no row-level
  * `round` on exact-decimal money values (engines disagree on half-ties).
  */
object Scalar {
  import Tables.t

  def defs: Seq[Q] = Seq(
    Q("q20_string_funcs", (s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_mktsegment"), lit("_"), col("c_nationkey").cast(StringType)).as("seg_nation"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked")),
      Some("""
        SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
               substring(c_name, 1, 8) AS name_prefix,
               concat(c_mktsegment, '_', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        FROM customer""")),

    Q("q21_date_funcs", (s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          min(dayofmonth(col("o_orderdate"))).cast("long").as("first_day"),
          max(datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))).cast("long").as("max_days_since")),
      Some("""
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
               min(day(o_orderdate)) AS first_day,
               max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_days_since
        FROM orders GROUP BY 1, 2""")),

    Q("q22_math_funcs", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_orderkey") % 7).as("key_mod"),
        (col("l_discount") * col("l_discount")).as("disc_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS qty_dev,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               sqrt(l_quantity) AS qty_sqrt,
               l_orderkey % 7 AS key_mod,
               l_discount * l_discount AS disc_sq,
               round(ln(l_extendedprice), 6) AS price_ln
        FROM lineitem WHERE l_orderkey < 1000""")),

    Q("q23_json_funcs", (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k")),
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS n,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1""")),

    Q("q24_case_agg", (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0)), 2).as("open_total"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0)), 2).as("finished_total"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_pending")),
      Some("""
        SELECT o_orderpriority AS priority,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_total,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_total,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders GROUP BY o_orderpriority""")),

    Q("q25_null_funcs", (s, d) =>
      Tables.events(s, d)
        .select(coalesce(nullif(col("event_type"), lit("view")), lit("suppressed")).as("etype"))
        .groupBy(col("etype")).agg(count(lit(1)).as("n")),
      Some("""
        SELECT coalesce(nullif(event_type, 'view'), 'suppressed') AS etype, count(*) AS n
        FROM events GROUP BY 1""")),

    // ---- loader projections as oracle-checked queries ------------------
    Q("q26_flatten", (s, d) => {
      // the loader's record-flattening (A6): nested struct -> parent__child
      val parsed = Tables.events(s, d).select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("props"))
      Flattener.flatten(parsed)
    }, Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props__k
      FROM events""")),

    Q("q27_extra_fields", (s, d) => {
      // the loader's extra-fields injection (A7), driven by real config
      val cfg = graft.core.GraftConfig(
        hdfsDestinationPath = "/unused",
        extraFields = Some("source_tag=fixture,run=7"),
        extraFieldsTypes = Some("source_tag=string,run=integer"))
      cfg.parsedExtraFields.foldLeft(
        t(s, d, "documents").select(col("doc_id"))) {
        case (df, (k, v, "integer")) => df.withColumn(k, lit(v.toLong))
        case (df, (k, v, _))         => df.withColumn(k, lit(v))
      }
    }, Some("""
      SELECT doc_id, 'fixture' AS source_tag, CAST(7 AS BIGINT) AS run
      FROM documents""")))
}
