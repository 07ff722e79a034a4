package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Round-4 SQL-surface completions: tolerance-bounded as-of join, unpivot
  * (melt), array higher-order functions, distribution rank statistics, and
  * normalize-then-dedup.
  */
object Surface {
  import Tables.{events, t}

  def defs: Seq[Q] = Seq(
    // as-of join with a lookback tolerance (pandas merge_asof tolerance):
    // matches further than 30 minutes back resolve to NULL instead of
    // joining stale state — same single-shuffle union+window plan
    Q("q62_asof_tolerance", (s, d) => {
      def side(tag: String, parity: Int) =
        events(s, d).filter(col("event_id") % 2 === parity)
          .select(col("event_id").as(s"${tag}_id"),
            col("user_id").as(s"${tag}_user"),
            unix_micros(col("ts")).as(s"${tag}_ts"))
      AsOfJoin.joinBackward(side("a", 1), side("b", 0),
          Seq("a_user"), Seq("b_user"), "a_ts", "b_ts", Seq("b_id"),
          tolerance = Some(1800000000L))
        .select(col("a_id"), col("a_user").as("user_id"), col("b_id"))
    }, Some("""
      WITH l AS (SELECT event_id AS a_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS a_ts
                 FROM events WHERE event_id % 2 = 1),
           r AS (SELECT event_id AS b_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS b_ts
                 FROM events WHERE event_id % 2 = 0),
      cand AS (SELECT l.a_id, l.user_id, r.b_id,
          row_number() OVER (PARTITION BY l.a_id
            ORDER BY r.b_ts DESC NULLS LAST) AS rn
        FROM l LEFT JOIN r ON l.user_id = r.user_id
          AND r.b_ts <= l.a_ts AND l.a_ts - r.b_ts <= 1800000000)
      SELECT a_id, user_id, b_id FROM cand WHERE rn = 1""")),

    // unpivot / melt (Dataset.unpivot): wide measures -> long (measure,
    // value) pairs — the inverse of q31_pivot
    Q("q63_unpivot", (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .withColumn("l_linenumber", col("l_linenumber").cast("long")),
      Some("""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               'l_quantity' AS measure, l_quantity AS value
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 100""")),

    // array higher-order surface: sort/slice/distinct/position/fold over
    // the token array, matched to DuckDB list functions
    Q("q64_array_funcs", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          expr("CAST(size(w) AS BIGINT)").as("n_tokens"),
          expr("CAST(size(array_distinct(w)) AS BIGINT)").as("n_distinct"),
          expr("array_join(slice(array_sort(w), 1, 3), ',')").as("first3_sorted"),
          expr("array_position(w, 'the')").as("pos_the"),
          expr("aggregate(w, 0L, (acc, x) -> acc + length(x))").as("sum_len")),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id, len(w) AS n_tokens,
               len(list_distinct(w)) AS n_distinct,
               array_to_string(list_sort(w)[1:3], ',') AS first3_sorted,
               coalesce(list_position(w, 'the'), 0)::BIGINT AS pos_the,
               list_reduce(list_prepend(0::BIGINT,
                 list_transform(w, x -> length(x)::BIGINT)),
                 (acc, x) -> acc + x) AS sum_len
        FROM w""")),

    // distribution rank statistics: percent_rank / cume_dist are exact
    // rationals of integer rank and count — the doubles match bit-for-bit
    Q("q65_rank_stats", (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
          percent_rank().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("pct_rank"),
          cume_dist().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("cume")),
      Some("""
        SELECT o_orderkey, o_orderpriority AS priority,
               percent_rank() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS pct_rank,
               cume_dist() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS cume
        FROM orders WHERE o_orderkey < 2000""")),

    // normalization-then-exact-dedup: casefold, strip punctuation, collapse
    // whitespace — the canonicalization pass that precedes hashing in every
    // corpus dedup pipeline (catches trivially-reformatted copies exact
    // dedup on raw bytes misses)
    Q("text_normalize_dedup", (s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val doubled = t(s, d, "documents")
        .unionByName(t(s, d, "documents")
          .withColumn("text", concat(upper(col("text")), lit("!!"))))
      doubled.groupBy(norm.as("norm_text"))
        .agg(min(col("doc_id")).as("kept_id"), count(lit(1)).as("copies"))
        .select(col("kept_id"), col("copies"))
    }, Some("""
      WITH doubled AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, upper(text) || '!!' FROM documents)
      SELECT min(doc_id) AS kept_id, count(*) AS copies
      FROM doubled
      GROUP BY trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))""")),

    // outer explode: rows whose array is empty SURVIVE with a NULL element
    // (plain explode drops them — the silent-row-loss trap of generators)
    Q("q66_explode_outer", (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 50)
        // tokens longer than 8 chars; many docs have none -> empty arrays
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> length(t) > 8)").as("longw"))
        .select(col("doc_id"), explode_outer(col("longw")).as("token")),
      Some("""
        WITH w AS (SELECT doc_id,
            list_filter(string_split(text, ' '), t -> length(t) > 8) AS longw
          FROM documents WHERE doc_id < 50)
        SELECT doc_id, unnest(CASE WHEN len(longw) = 0
                 THEN [NULL::VARCHAR] ELSE longw END) AS token
        FROM w""")),

    // map higher-order functions: transform_values / map_filter /
    // map_concat introspection over a built map
    Q("q67_map_hof", (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          map(lit("price_cents"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
            lit("custkey"), col("o_custkey")).as("m"))
        .select(col("o_orderkey"),
          expr("transform_values(m, (k, v) -> v * 2)['custkey']").as("cust2"),
          expr("cardinality(map_filter(m, (k, v) -> v > 100000))").cast("long")
            .as("n_big"),
          expr("array_join(map_keys(m), ',')").as("keys_csv")),
      Some("""
        WITH m AS (SELECT o_orderkey,
            map(['price_cents', 'custkey'],
                [CAST(round(o_totalprice * 100) AS BIGINT), o_custkey]) AS m
          FROM orders WHERE o_orderkey < 500)
        SELECT o_orderkey,
               (map_values(m)[2]) * 2 AS cust2,
               len(list_filter(map_values(m), v -> v > 100000)) AS n_big,
               array_to_string(map_keys(m), ',') AS keys_csv
        FROM m""")),

    // sequence generation + date arithmetic: one row per month an order's
    // year spans (generator over computed ranges)
    Q("q68_sequence", (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          explode(expr(
            "sequence(1, month(o_orderdate))")).as("m"))
        .withColumn("m", col("m").cast("long")),
      Some("""
        SELECT o_orderkey, unnest(range(1, month(o_orderdate) + 1)) AS m
        FROM orders WHERE o_orderkey < 200""")),

    // incremental dedup against a persisted fingerprint index: the corpus
    // is processed as two batches; the union of per-batch outputs must
    // equal the one-shot minhash dedup of the whole corpus — which is
    // exactly the oracle (same CTE chain as dedup_minhash)
    Q("dedup_incremental", (s, d) => {
      import graft.operators.IncrementalDedup
      val docs = t(s, d, "documents")
      val dir = java.nio.file.Files.createTempDirectory("inc-index")
      dir.toFile.deleteOnExit()
      val b1 = IncrementalDedup.processBatch(
        docs.filter(col("doc_id") < 250), "doc_id", "text", dir.toString)
      val b2 = IncrementalDedup.processBatch(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", dir.toString)
      b1.unionByName(b2)
    }, Some(s"""${Extensions.minhashPairCtes}
      |SELECT id_a, id_b FROM pairs""".stripMargin)))
}
