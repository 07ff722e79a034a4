package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{VectorExprs => V}
import graft.operators.{FeatureEng, Similarity, Stats, TextAnalysis,
  TimeSeries}

/** Round-11 additions: rank statistics on the new distributed global-rank
  * primitive (Spearman, ROC AUC, Gini), classifier-evaluation and
  * data-quality audits (Cohen's kappa, Benford first-digit, per-group
  * OLS), distribution drift (Jensen-Shannon), token-entropy scoring,
  * autocorrelation seasonality, and mutual-nearest-neighbor alignment.
  */
object Round11 {
  import Tables.t

  def defs: Seq[Q] = Seq(

    // ---- Spearman rank correlation ------------------------------------
    // monotone association between quantity and line price; DOUBLED
    // midranks keep ties integer-exact at value grain (the Mann-Whitney
    // machinery), ranks ride the GlobalRank sharded prefix sum, and the
    // closing Pearson-over-ranks is one mirrored double over exact longs.
    Q("q140_spearman", (s, d) =>
      Stats.spearman(t(s, d, "lineitem"), "l_quantity", "l_extendedprice",
        xScale = 1.0, yScale = 100.0),
      Some("""
        WITH base AS (SELECT CAST(round(l_quantity * 1.0) AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
              FROM lineitem),
        pvx AS (SELECT x AS v, count(*) AS t FROM base GROUP BY 1),
        rx AS (SELECT v, 2 * (CAST(sum(t) OVER (ORDER BY v ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - t) + t + 1 AS dr FROM pvx),
        pvy AS (SELECT y AS v, count(*) AS t FROM base GROUP BY 1),
        ry AS (SELECT v, 2 * (CAST(sum(t) OVER (ORDER BY v ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - t) + t + 1 AS dr FROM pvy),
        j AS (SELECT rx.dr AS da, ry.dr AS db
              FROM base JOIN rx ON base.x = rx.v JOIN ry ON base.y = ry.v),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(da) AS BIGINT) AS sa,
                  CAST(sum(db) AS BIGINT) AS sb,
                  CAST(sum(da * db) AS BIGINT) AS sab,
                  CAST(sum(da * da) AS BIGINT) AS saa,
                  CAST(sum(db * db) AS BIGINT) AS sbb
                FROM j)
        SELECT n,
               round((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
                 / sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                      * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
                 AS rho
        FROM agg""")),

    // ---- ROC AUC of the heuristic quality score -----------------------
    // does the quality score separate English docs? AUC via the doubled
    // midrank rank-sum (exact tie handling; = the Mann-Whitney statistic
    // normalized), value-grain + GlobalRank — no per-row window.
    Q("q141_auc", (s, d) =>
      Stats.aucScore(Tables.ts(s, d, "documents"),
        col("lang") === "en",
        TextAnalysis.qualityScoreX1e4("text").cast("double"),
        valScale = 1.0),
      Some("""
        WITH sc AS (SELECT ((
          (CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 10000
                WHEN length(text) < 100 THEN length(text) * 100
                ELSE 2000 END) * 4
          + (len(list_filter(string_split(text, ' '),
               tk -> tk IN ('the', 'a', 'of', 'and'))) * 30000)
              // len(string_split(text, ' '))
          + ((length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) * 30000)
              // length(text)
        ) // 10) AS q, (lang = 'en') AS pos FROM documents),
        base AS (SELECT CAST(round(q * 1.0) AS BIGINT) AS v, pos FROM sc),
        pv AS (SELECT v, CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
                 count(*) AS tt
               FROM base GROUP BY 1),
        r AS (SELECT v, np, tt,
                2 * (CAST(sum(tt) OVER (ORDER BY v ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - tt) + tt + 1 AS dr
              FROM pv),
        agg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                  CAST(sum(tt) - sum(np) AS BIGINT) AS n_neg,
                  CAST(sum(np * dr) AS BIGINT) AS r2
                FROM r)
        SELECT n_pos, n_neg,
               CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST(round(1e6 * CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * n_neg)) AS BIGINT) END
                 AS auc_micro
        FROM agg""")),

    // ---- Gini concentration of customer revenue -----------------------
    // how concentrated is revenue across customers? Entity-grain ranks
    // via GlobalRank (no single-task sort); exact integer rank-weighted
    // sum, one mirrored closing division.
    Q("q142_gini", (s, d) =>
      Stats.gini(t(s, d, "orders").withColumn("cents",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
        "o_custkey", "cents"),
      Some("""
        WITH ents AS (SELECT o_custkey AS ent,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
              FROM orders GROUP BY 1),
        r AS (SELECT v, CAST(row_number() OVER (ORDER BY v ASC, ent ASC)
                AS BIGINT) AS i FROM ents),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(min(v) AS BIGINT) AS minv,
                  CAST(sum(v) AS BIGINT) AS total,
                  CAST(sum(i * v) AS BIGINT) AS siv
                FROM r)
        SELECT n, total,
               CASE WHEN n = 0 OR total <= 0 OR minv < 0
               THEN CAST(NULL AS BIGINT)
               ELSE CAST(round(1e6 * (2.0 * CAST(siv AS DOUBLE)
                 - CAST(n + 1 AS DOUBLE) * total)
                 / (CAST(n AS DOUBLE) * total)) AS BIGINT) END AS gini_micro
        FROM agg""")),

    // ---- Cohen's kappa: declared lang vs n-gram language ID -----------
    // chance-corrected agreement between the dataset's lang label and the
    // heuristic n-gram language id — exact contingency + margins, mirrored
    // division, micro-scaled.
    Q("q143_kappa", (s, d) =>
      Stats.cohensKappa(
        Tables.ts(s, d, "documents").select(col("lang"),
          TextAnalysis.langId("text").as("pred")),
        "lang", "pred"),
      Some {
        val scores = TextAnalysis.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(string_split(text, ' '), tk -> tk IN ${TextAnalysis.sqlSet(ms)})) AS s_$lang"
        }.mkString(",\n          ")
        val langs = TextAnalysis.LangMarkers.map(_._1)
        val maxExpr = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val caseExpr = langs.map(l => s"WHEN s_$l = $maxExpr THEN '$l'")
          .mkString("CASE ", " ", " ELSE 'und' END")
        s"""WITH scored AS (SELECT lang, $scores FROM documents),
          |pairs AS (SELECT lang AS a, $caseExpr AS b FROM scored),
          |joint AS (SELECT a, b, count(*) AS nab FROM pairs GROUP BY 1, 2),
          |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM joint GROUP BY 1),
          |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM joint GROUP BY 1),
          |st AS (SELECT CAST(sum(nab) AS BIGINT) AS n,
          |         CAST(sum(CASE WHEN a = b THEN nab ELSE 0 END) AS BIGINT) AS agree
          |       FROM joint),
          |pe AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS spe
          |       FROM ma JOIN mb ON ma.a = mb.b)
          |SELECT n,
          |  CAST(round(1e6 * CAST(agree AS DOUBLE) / n) AS BIGINT) AS po_micro,
          |  CAST(round(1e6 * CAST(spe AS DOUBLE) / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS pe_micro,
          |  CASE WHEN CAST(n AS DOUBLE) * n = CAST(spe AS DOUBLE)
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(round(1e6
          |    * (CAST(n AS DOUBLE) * agree - CAST(spe AS DOUBLE))
          |    / (CAST(n AS DOUBLE) * n - CAST(spe AS DOUBLE))) AS BIGINT)
          |  END AS kappa_micro
          |FROM st CROSS JOIN pe""".stripMargin
      }),

    // ---- Benford first-digit audit ------------------------------------
    // first digits of order totals (cents) vs log10(1+1/d): integer
    // digit extraction, exact counts, mirrored expected/chi2 doubles.
    Q("q144_benford", (s, d) =>
      Stats.benford(t(s, d, "orders").withColumn("cents",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")), "cents"),
      Some("""
        WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
              FROM orders),
        dg AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
                AS digit FROM v WHERE v > 0),
        c AS (SELECT digit, count(*) AS n_obs FROM dg GROUP BY 1),
        tot AS (SELECT CAST(coalesce(sum(n_obs), 0) AS BIGINT) AS n FROM c),
        digits AS (SELECT CAST(d.range AS BIGINT) AS digit FROM range(1, 10) d)
        SELECT digits.digit,
               CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
               CAST(round(1e6 * log10(1.0 + 1.0 / CAST(digits.digit AS DOUBLE)))
                 AS BIGINT) AS expected_micro,
               CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST(round(1e6
                 * (CAST(coalesce(c.n_obs, 0) AS DOUBLE)
                    - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(digits.digit AS DOUBLE)))
                 * (CAST(coalesce(c.n_obs, 0) AS DOUBLE)
                    - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(digits.digit AS DOUBLE)))
                 / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(digits.digit AS DOUBLE))))
                 AS BIGINT) END AS chi2_micro
        FROM digits LEFT JOIN c ON digits.digit = c.digit CROSS JOIN tot""")),

    // ---- per-group OLS line fit ---------------------------------------
    // price-vs-quantity trend per return flag: exact integer moment sums
    // (quantity at 1e0, price at cents), mirrored closed-form algebra.
    Q("q145_ols", (s, d) =>
      Stats.olsFit(t(s, d, "lineitem"), "l_returnflag", "l_quantity",
        "l_extendedprice", xScale = 1.0, yScale = 100.0),
      Some("""
        WITH base AS (SELECT l_returnflag AS grp,
                CAST(round(l_quantity * 1.0) AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM base GROUP BY 1),
        w AS (SELECT *, CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx
                AS den FROM m)
        SELECT grp, n,
               CASE WHEN den = 0.0 THEN CAST(NULL AS DOUBLE)
               ELSE round((CAST(n AS DOUBLE) * sxy
                 - CAST(sx AS DOUBLE) * sy) / den * 0.01, 6) END AS slope,
               CASE WHEN den = 0.0 THEN CAST(NULL AS DOUBLE)
               ELSE round((CAST(sy AS DOUBLE)
                 - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / den
                   * sx) / n / 100.0, 6) END AS intercept
        FROM w""")),

    // ---- Jensen-Shannon drift between event slices --------------------
    // event-type mix drift between the two user-parity halves (a random
    // split, so JSD should sit near 0 — the monitor's null reading);
    // bounded symmetric divergence, exact counts, one mirrored ln per
    // category per side, micro-nats.
    Q("q146_jsd", (s, d) => {
      val ev = Tables.events(s, d)
      FeatureEng.jsDivergence(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "event_type")
    }, Some("""
        WITH ca AS (SELECT event_type AS cat, count(*) AS a
              FROM events WHERE user_id % 2 = 0 GROUP BY 1),
        cb AS (SELECT event_type AS cat, count(*) AS b
              FROM events WHERE user_id % 2 = 1 GROUP BY 1),
        j AS (SELECT coalesce(ca.cat, cb.cat) AS cat,
                CAST(coalesce(a, 0) AS BIGINT) AS a,
                CAST(coalesce(b, 0) AS BIGINT) AS b
              FROM ca FULL JOIN cb ON ca.cat = cb.cat),
        tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
                  CAST(sum(b) AS BIGINT) AS n_b FROM j),
        terms AS (SELECT a, b,
                CASE WHEN a = 0 THEN 0 ELSE a * CAST(round(ln(
                  2.0 * CAST(a AS DOUBLE) * n_b
                  / (CAST(a AS DOUBLE) * n_b + CAST(b AS DOUBLE) * n_a))
                  * 1000000.0) AS BIGINT) END AS ta,
                CASE WHEN b = 0 THEN 0 ELSE b * CAST(round(ln(
                  2.0 * CAST(b AS DOUBLE) * n_a
                  / (CAST(a AS DOUBLE) * n_b + CAST(b AS DOUBLE) * n_a))
                  * 1000000.0) AS BIGINT) END AS tb
              FROM j CROSS JOIN tot)
        SELECT (SELECT n_a FROM tot) AS n_a, (SELECT n_b FROM tot) AS n_b,
               CAST(count(*) AS BIGINT) AS n_cats,
               CAST(round(CAST(sum(ta) AS DOUBLE) / (2.0 * (SELECT n_a FROM tot))
                 + CAST(sum(tb) AS DOUBLE) / (2.0 * (SELECT n_b FROM tot)))
                 AS BIGINT) AS jsd_micro
        FROM terms""")),

    // ---- per-document token entropy -----------------------------------
    // information-theoretic repetition scoring: H = ln L − Σc·ln c / L in
    // micro-nats; one ln per distinct (doc, token) count, integerized
    // before the count-weighted sum.
    Q("text_token_entropy", (s, d) =>
      TextAnalysis.tokenEntropy(Tables.ts(s, d, "documents"), "doc_id",
        "text"),
      Some("""
        WITH c AS (SELECT doc_id, w, count(*) AS c FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents) GROUP BY 1, 2),
        s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0)
                  AS BIGINT)) AS BIGINT) AS s
              FROM c GROUP BY 1)
        SELECT doc_id AS id, n_tokens,
               CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0
                 - CAST(s AS DOUBLE) / n_tokens) AS BIGINT) AS entropy_micro
        FROM s""")),

    // ---- autocorrelation of daily event counts ------------------------
    // weekly-rhythm probe: ACF at lags 1..7 per event type over the
    // date-ordered daily count series; mean multiplied through so every
    // sum is an exact long, one mirrored division per (grp, lag).
    Q("q147_acf", (s, d) =>
      TimeSeries.acf(Tables.events(s, d), "event_type", "ts", 7),
      Some("""
        WITH daily AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS x
              FROM events GROUP BY 1, 2),
        st AS (SELECT grp, x,
                CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n,
                CAST(sum(x) OVER (PARTITION BY grp) AS BIGINT) AS sx,
                CAST(row_number() OVER (PARTITION BY grp ORDER BY d)
                  AS BIGINT) AS rn
              FROM daily),
        cxt AS (SELECT grp, rn, n, n * x - sx AS cx FROM st),
        den AS (SELECT grp, CAST(max(n) AS BIGINT) AS n_days,
                  CAST(sum(cx * cx) AS BIGINT) AS den
                FROM cxt GROUP BY 1),
        pairs AS (SELECT c.grp, CAST(t.range AS BIGINT) AS lag,
                  CAST(sum(c.cx * c2.cx) AS BIGINT) AS num
                FROM cxt c CROSS JOIN range(1, 8) t
                JOIN cxt c2 ON c2.grp = c.grp AND c2.rn = c.rn + t.range
                GROUP BY 1, 2)
        SELECT den.grp, lag, n_days,
               CASE WHEN den = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST(round(1e6 * CAST(num AS DOUBLE) / den) AS BIGINT)
               END AS acf_micro
        FROM den JOIN pairs ON den.grp = pairs.grp""")),

    // ---- mutual nearest neighbors -------------------------------------
    // alignment pairs: both sides in each other's exact top-5 — the
    // hub-resistant matching primitive; one top-k pass + one self-join
    // of the k·N candidate list on the reversed pair.
    Q("sim_mnn", (s, d) =>
      Similarity.mutualTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 5, broadcastCorpus = true),
      Some(s"""
        WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
        scored AS (SELECT a.id AS query_id, c.id AS neighbor_id,
            ${V.duckCosine("a.v", "c.v")} AS cos,
            row_number() OVER (PARTITION BY a.id
              ORDER BY ${V.duckCosine("a.v", "c.v")} DESC, c.id ASC) AS rank
          FROM e a JOIN e c ON a.id <> c.id),
        tk AS (SELECT query_id, neighbor_id, round(cos, 6) AS cos
               FROM scored WHERE rank <= 5)
        SELECT f.query_id AS id_a, f.neighbor_id AS id_b, f.cos
        FROM tk f JOIN tk r ON f.query_id = r.neighbor_id
                           AND f.neighbor_id = r.query_id
        WHERE f.query_id < f.neighbor_id""")))
}
