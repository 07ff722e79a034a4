package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{HashExprs => H, VectorExprs => V}
import graft.operators.{Similarity, Stats, TextAnalysis, TimeSeries}

/** Round-12 additions: feature screening (weight of evidence /
  * information value), robust trend estimation (Theil-Sen median slope),
  * winnowing document fingerprints (the MOSS local-fingerprint guarantee)
  * with a postings-join near-dup pass, corpus-order vocabulary growth
  * with a Heaps-law fit, and the dimension-truncation recall audit
  * (the Matryoshka-embedding question asked of the stored index).
  *
  * Same discipline as every round: each query is a declarative Spark plan
  * with an operation-for-operation DuckDB oracle; doubles appear only as
  * single mirrored divisions/lns of exact integers, micro-scaled before
  * any cross-row sum.
  */
object Round12 {
  import Tables.t

  private val P = H.P
  private val K = TextAnalysis.WinnowPosCap

  /** Shared winnowing CTE chain (documents → selected fingerprints),
    * mirroring [[TextAnalysis.winnowFingerprints]] with w = 4, k = 3:
    * ordered word-3-gram hashes, per-window packed `list_min` (min hash,
    * rightmost position on ties), distinct per document. */
  private[queries] def duckWinnowSel: String = {
    val wh = H.duckWordHashes("text")
    s"""gr AS (SELECT doc_id AS id,
       |    CASE WHEN len(wh) >= 3 THEN list_transform(
       |      range(0, len(wh) - 2),
       |      i -> ((wh[i+1] * 31 + wh[i+2]) % $P * 31 + wh[i+3]) % $P)
       |    ELSE CAST([] AS BIGINT[]) END AS g
       |  FROM (SELECT doc_id, $wh AS wh FROM documents)),
       |wm AS (SELECT id, g, len(g) AS m FROM gr WHERE len(g) >= 1),
       |sel AS (SELECT id, unnest(list_distinct(list_transform(
       |    range(0, greatest(m - 4, 0) + 1),
       |    j -> list_min(list_transform(range(j + 1, least(j + 4, m) + 1),
       |           p -> g[p] * $K + $K - p))))) AS e
       |  FROM wm)""".stripMargin
  }

  def defs: Seq[Q] = Seq(

    // ---- weight of evidence / information value -----------------------
    // is `source` a usable signal for long-form documents? per-source WoE
    // of the n_chars >= 300 label with Jeffreys 0.5 smoothing: one ln of
    // an exact integer rational per category, category-grain everything.
    Q("q153_woe", (s, d) =>
      Stats.weightOfEvidence(t(s, d, "documents"), col("source"),
        col("n_chars") >= 300),
      Some("""
        WITH b AS (SELECT coalesce(source, chr(1)) AS cat,
                (n_chars >= 300) AS y FROM documents),
        cats AS (SELECT cat,
                CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
              FROM b WHERE y IS NOT NULL GROUP BY 1),
        tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
                  CAST(sum(n_neg) AS BIGINT) AS tn,
                  CAST(count(*) AS BIGINT) AS c FROM cats)
        SELECT cat, n_pos, n_neg,
          CAST(round(1e6 * ln(
            (CAST(2*n_pos+1 AS DOUBLE) * CAST(2*tn+c AS DOUBLE))
            / (CAST(2*n_neg+1 AS DOUBLE) * CAST(2*tp+c AS DOUBLE)))) AS BIGINT) AS woe_micro,
          CAST(round(1e6 * (CAST(2*n_pos+1 AS DOUBLE) / CAST(2*tp+c AS DOUBLE)
                         - CAST(2*n_neg+1 AS DOUBLE) / CAST(2*tn+c AS DOUBLE))
            * ln((CAST(2*n_pos+1 AS DOUBLE) * CAST(2*tn+c AS DOUBLE))
                 / (CAST(2*n_neg+1 AS DOUBLE) * CAST(2*tp+c AS DOUBLE)))) AS BIGINT) AS iv_micro
        FROM cats CROSS JOIN tot""")),

    // ---- Theil-Sen robust daily trend ---------------------------------
    // median pairwise slope of daily event counts per type — day-grain
    // pairs on the calendar axis, exact lower-median selection.
    Q("q154_theil_sen", (s, d) =>
      TimeSeries.theilSen(Tables.events(s, d), "event_type", "ts"),
      Some("""
        WITH daily AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dd,
                CAST(count(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
        dt AS (SELECT grp,
                CAST(date_diff('day', DATE '1970-01-01', dd) AS BIGINT) AS t,
                x FROM daily),
        p AS (SELECT a.grp, a.t AS ti, b.t AS tj,
                CAST(round(1e6 * CAST(b.x - a.x AS DOUBLE) / (b.t - a.t))
                  AS BIGINT) AS slope_micro
              FROM dt a JOIN dt b ON a.grp = b.grp AND a.t < b.t),
        r AS (SELECT grp, slope_micro,
                CAST(row_number() OVER (PARTITION BY grp
                  ORDER BY slope_micro, ti, tj) AS BIGINT) AS rn,
                CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS m
              FROM p),
        nd AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_days
              FROM daily GROUP BY 1)
        SELECT r.grp, n_days, m AS n_pairs, slope_micro
        FROM r JOIN nd ON r.grp = nd.grp
        WHERE rn = (m + 1) // 2""")),

    // ---- winnowing fingerprints ---------------------------------------
    // MOSS document fingerprints: any shared word run of length >= 6
    // (w + k - 1) between two documents shares a selected fingerprint;
    // pos localizes WHERE. Narrow per-doc projection, no shuffle.
    Q("text_winnow", (s, d) =>
      TextAnalysis.winnowFingerprints(t(s, d, "documents"), "doc_id",
        "text", w = 4),
      Some(s"""
        WITH $duckWinnowSel
        SELECT id, CAST($K - e % $K AS BIGINT) AS pos,
               CAST(e // $K AS BIGINT) AS fp
        FROM sel""")),

    // ---- winnowing near-dup pairs -------------------------------------
    // postings join over selected fingerprints, df-capped against
    // boilerplate grams, >= 3 shared distinct fingerprint hashes.
    Q("dedup_winnow", (s, d) =>
      TextAnalysis.winnowPairs(t(s, d, "documents"), "doc_id", "text",
        w = 4, minShared = 3, dfCap = 50),
      Some(s"""
        WITH $duckWinnowSel,
        fps AS (SELECT DISTINCT id, CAST(e // $K AS BIGINT) AS fp FROM sel),
        kept AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        posts AS (SELECT fps.id, fps.fp FROM fps JOIN kept USING (fp))
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM posts a JOIN posts b ON a.fp = b.fp AND a.id < b.id
        GROUP BY 1, 2 HAVING count(*) >= 3""")),

    // ---- vocabulary growth curve --------------------------------------
    // cumulative tokens and distinct word types in doc_id order, sampled
    // every 10 ranks; cumulatives ride the sharded GlobalRank pass.
    Q("text_vocab_growth", (s, d) =>
      TextAnalysis.vocabGrowth(t(s, d, "documents"), "doc_id", "text",
        step = 10L),
      Some("""
        WITH dd AS (SELECT doc_id AS id, string_split(text, ' ') AS ws
              FROM documents),
        rr AS (SELECT id, ws,
                CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS r
              FROM dd),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
        fw AS (SELECT w, min(r) AS fr FROM (
                SELECT r, unnest(list_distinct(ws)) AS w FROM rr)
              GROUP BY 1),
        na AS (SELECT fr AS r, CAST(count(*) AS BIGINT) AS nw
              FROM fw GROUP BY 1),
        pd AS (SELECT rr.r, CAST(len(ws) AS BIGINT) AS ntok,
                CAST(coalesce(nw, 0) AS BIGINT) AS nw
              FROM rr LEFT JOIN na ON rr.r = na.r),
        c AS (SELECT r,
                CAST(sum(ntok) OVER (ORDER BY r) AS BIGINT) AS cum_tokens,
                CAST(sum(nw) OVER (ORDER BY r) AS BIGINT) AS cum_types
              FROM pd)
        SELECT r, cum_tokens, cum_types FROM c CROSS JOIN nn
        WHERE r % 10 = 0 OR r = nn.n""")),

    // ---- Heaps-law fit ------------------------------------------------
    // V = k·N^beta over the sampled growth curve: micro-integerized lns,
    // DECIMAL moment sums, one mirrored closed form.
    Q("text_heaps_law", (s, d) =>
      TextAnalysis.heapsLaw(t(s, d, "documents"), "doc_id", "text",
        step = 10L),
      Some("""
        WITH dd AS (SELECT doc_id AS id, string_split(text, ' ') AS ws
              FROM documents),
        rr AS (SELECT id, ws,
                CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS r
              FROM dd),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
        fw AS (SELECT w, min(r) AS fr FROM (
                SELECT r, unnest(list_distinct(ws)) AS w FROM rr)
              GROUP BY 1),
        na AS (SELECT fr AS r, CAST(count(*) AS BIGINT) AS nw
              FROM fw GROUP BY 1),
        pd AS (SELECT rr.r, CAST(len(ws) AS BIGINT) AS ntok,
                CAST(coalesce(nw, 0) AS BIGINT) AS nw
              FROM rr LEFT JOIN na ON rr.r = na.r),
        c AS (SELECT r,
                CAST(sum(ntok) OVER (ORDER BY r) AS BIGINT) AS cum_tokens,
                CAST(sum(nw) OVER (ORDER BY r) AS BIGINT) AS cum_types
              FROM pd),
        pts AS (SELECT
                CAST(round(1e6 * ln(CAST(cum_tokens AS DOUBLE))) AS BIGINT) AS x,
                CAST(round(1e6 * ln(CAST(cum_types AS DOUBLE))) AS BIGINT) AS y
              FROM c CROSS JOIN nn
              WHERE (r % 10 = 0 OR r = nn.n)
                AND cum_tokens > 0 AND cum_types > 0),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
                sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx FROM pts),
        mm AS (SELECT n_points, sx, sy,
                n_points * sxy - sx * sy AS nm,
                n_points * sxx - sx * sx AS dn FROM m)
        SELECT n_points,
          CASE WHEN n_points = 0 OR dn = 0 THEN CAST(NULL AS BIGINT)
          ELSE CAST(round(1e6
            * (CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE))) AS BIGINT)
          END AS beta_micro,
          CASE WHEN n_points = 0 OR dn = 0 THEN CAST(NULL AS BIGINT)
          ELSE CAST(round(
            (CAST(sy AS DOUBLE) - CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE)
              * CAST(sx AS DOUBLE)) / n_points) AS BIGINT)
          END AS lnk_micro
        FROM mm""")),

    // ---- dimension-truncation recall audit ----------------------------
    // recall@5 of first-32-dims cosine top-5 vs full 64-dim top-5 over a
    // 20-query audit panel; both rankings exact and deterministic.
    Q("sim_truncation_recall", (s, d) =>
      Similarity.truncationRecall(t(s, d, "embeddings"), "vec_id",
        "embedding", k = 5, dims = 32, nQueries = 20),
      Some(s"""
        WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
        q AS (SELECT id, v FROM e WHERE id < 20),
        fullr AS (SELECT query_id, neighbor_id FROM (
            SELECT q.id AS query_id, c.id AS neighbor_id,
              row_number() OVER (PARTITION BY q.id
                ORDER BY ${V.duckCosine("q.v", "c.v")} DESC, c.id ASC) AS rank
            FROM q JOIN e c ON q.id <> c.id)
          WHERE rank <= 5),
        tr AS (SELECT query_id, neighbor_id FROM (
            SELECT q.id AS query_id, c.id AS neighbor_id,
              row_number() OVER (PARTITION BY q.id
                ORDER BY ${V.duckCosine("q.v[1:32]", "c.v[1:32]")} DESC,
                  c.id ASC) AS rank
            FROM q JOIN e c ON q.id <> c.id)
          WHERE rank <= 5)
        SELECT fullr.query_id,
          CAST(sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits,
          CAST(sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               * 10000 // count(*) AS BIGINT) AS recall_bp
        FROM fullr LEFT JOIN tr
          ON fullr.query_id = tr.query_id
          AND fullr.neighbor_id = tr.neighbor_id
        GROUP BY fullr.query_id""".stripMargin))
  )
}
