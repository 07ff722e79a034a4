package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{AudioNative, VectorExprs => V}
import graft.operators.{Similarity, Stats, TextAnalysis, TimeSeries}

/** Round-14 second wave — the evaluation-and-diagnostics growth set:
  *  - q168_wilcoxon: paired signed-rank test (the matched-pairs gap in
  *    the rank-test family);
  *  - q169_brown_forsythe: variance-homogeneity gate (Levene on lower
  *    medians);
  *  - q170_dunn_fdr: Dunn's post-hoc after Kruskal-Wallis, closed with
  *    BH-FDR — WHICH groups differ, not just whether some do;
  *  - q171_ljung_box: portmanteau white-noise test composing q147's acf;
  *  - q172_ewma: bounded-kernel exponential smoothing of daily counts
  *    (shared-constant weights: the kernel is computed once driver-side
  *    and enters both engines as the same literal table);
  *  - text_readability: Flesch-Kincaid grade / reading-ease over the
  *    documents corpus (vowel-run syllables, terminal-punctuation
  *    sentences);
  *  - sim_rank_eval: retrieval-quality metrics (NDCG@10, AP@10, first
  *    relevant rank) for the label-relevance top-k — the missing eval
  *    half of the ANN family (recall audits measure index fidelity;
  *    this measures whether the RANKING is any good).
  */
object Round14b {
  import Tables.t

  /** [[TimeSeries.ewmaDaily]] kernel parameters — one definition feeds
    * the Spark call AND the literal weight table in the oracle. */
  private val EwmaAlpha = 0.25
  private val EwmaWindow = 14
  private val ewmaW: Seq[Long] = TimeSeries.ewmaWeightsMicro(EwmaAlpha, EwmaWindow)

  /** Canonical mono PCM16 WAV header for 64-sample synthetic payloads
    * (RIFF size 164, 8 kHz, block align 2, data length 128) — the
    * construct half of mm_audio_stats' construct→decode→oracle pattern
    * (the mm_media_headers discipline: the oracle recomputes the stats
    * from the generating formula, so the REAL decode path is what's
    * being checked). */
  private val WavHeaderHex: String =
    "52494646" + "A4000000" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "80000000"

  /** The synthetic sample formula, shared verbatim by the Spark
    * constructor and the DuckDB oracle: deterministic pseudo-signal in
    * [−2000, 2000], amplified ×16 for every 7th doc so the clipping and
    * silence gates both have work. `i` is the sample index expression. */
  private def wavSample(i: String): String =
    s"((doc_id * 31 + $i * 997) % 4001 - 2000)" +
      " * (CASE WHEN doc_id % 7 = 0 THEN 16 ELSE 1 END)"

  /** The Spark-side 64-sample synthetic-WAV constructor over
    * [[wavSample]] (shared by mm_audio_stats and the streaming gate). */
  private val audioStatsMediaSql: String =
    s"""unhex(concat('$WavHeaderHex',
      |  aggregate(sequence(0L, 63L), '', (acc, i) -> concat(acc,
      |    lpad(hex(pmod(${wavSample("i")}, 65536) % 256), 2, '0'),
      |    lpad(hex(pmod(${wavSample("i")}, 65536) div 256), 2, '0')))
      |))""".stripMargin

  /** 63-sample variant of [[WavHeaderHex]] (RIFF size 162, data 126
    * bytes): 63 frames map 1:1 onto the 63 perceptual-envelope cells, so
    * the envelope IS the |amplitude| sequence and a uniform gain change
    * cancels EXACTLY in the integer normalization `e·255 div max` —
    * byte-identical fingerprints across volume, provable in SQL. */
  private val WavHeader63Hex: String =
    "52494646" + "A2000000" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "7E000000"

  /** Signal-CLASS sample formula for the audio dedup family: the signal
    * depends only on `doc_id % 40` (so each class repeats across the
    * corpus) while the ×16 amplification still keys off the raw doc_id —
    * same class at different volume = the near-duplicate the
    * volume-invariant envelope must collapse. */
  private def wavClassSample(i: String): String =
    s"(((doc_id % 40) * 53 + $i * 997) % 3001 - 1500)" +
      " * (CASE WHEN doc_id % 7 = 0 THEN 16 ELSE 1 END)"

  /** The Spark-side synthetic-WAV constructor over [[wavClassSample]]
    * (shared by both audio envelope queries and the ScaleSmoke row). */
  private[graft] val audioClassMediaSql: String =
    s"""unhex(concat('$WavHeader63Hex',
      |  aggregate(sequence(0L, 62L), '', (acc, i) -> concat(acc,
      |    lpad(hex(pmod(${wavClassSample("i")}, 65536) % 256), 2, '0'),
      |    lpad(hex(pmod(${wavClassSample("i")}, 65536) div 256), 2, '0')))
      |))""".stripMargin

  /** DuckDB: the volume-normalized 63-cell envelope fingerprint computed
    * from [[wavClassSample]] FIRST PRINCIPLES (|m| per cell → ·255 div
    * max → dHash bits) — the oracle half of the real decodeWavEnvelope
    * path. Yields CTEs ending in `efp(doc_id, fp)`. */
  private[graft] val duckEnvelopeFpCtes: String =
    s"""es AS (SELECT doc_id, CAST(t.range AS BIGINT) AS f,
       |        abs(${wavClassSample("CAST(t.range AS BIGINT)")}) AS a
       |      FROM documents CROSS JOIN range(63) t),
       |emx AS (SELECT doc_id, CAST(max(a) AS BIGINT) AS mx
       |      FROM es GROUP BY 1),
       |ecells AS (SELECT es.doc_id,
       |        list(CASE WHEN mx = 0 THEN 0 ELSE a * 255 // mx END
       |          ORDER BY f) AS cells
       |      FROM es JOIN emx ON es.doc_id = emx.doc_id
       |      GROUP BY 1),
       |efp AS (SELECT doc_id,
       |        ${graft.operators.PerceptualHash.duckDHashBits("cells")}
       |          AS fp
       |      FROM ecells)""".stripMargin

  def defs: Seq[Q] = Seq(

    // ---- Wilcoxon signed-rank --------------------------------------------
    // does a user's view spend differ from their click spend, PAIRED by
    // user? Per-user exact micro-sums (longs, not double means) feed the
    // pre-integerized pair contract; zero-diff users drop, |d| midranks
    // pool on the value grain.
    Q("q168_wilcoxon", (s, d) => {
      val ev = Tables.events(s, d)
      val micro = expr("CAST(round(value * 1e6) AS BIGINT)")
      val pairs = ev.groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", micro)).as("xv"),
          sum(when(col("event_type") === "click", micro)).as("yv"))
      Stats.wilcoxonSignedRank(pairs, "xv", "yv")
    }, Some("""
      WITH pr AS (SELECT user_id,
              sum(CASE WHEN event_type = 'view'
                  THEN CAST(round(value * 1e6) AS BIGINT) END) AS x,
              sum(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 1e6) AS BIGINT) END) AS y
            FROM events GROUP BY 1),
      df AS (SELECT x - y AS dd FROM pr
            WHERE x IS NOT NULL AND y IS NOT NULL AND x <> y),
      pv AS (SELECT abs(dd) AS v, CAST(count(*) AS BIGINT) AS t,
              CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
            FROM df GROUP BY 1),
      dm AS (SELECT tp, t,
              2 * (CAST(sum(t) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) - t) + t + 1 AS dr
            FROM pv),
      agg AS (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS n_pairs,
              CAST(coalesce(sum(tp * dr), 0) AS BIGINT) AS w2_plus,
              coalesce(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS tie3
            FROM dm)
      SELECT n_pairs, w2_plus,
        CASE WHEN n_pairs = 0 THEN CAST(NULL AS DOUBLE)
          WHEN CAST(n_pairs AS DOUBLE) * (n_pairs + 1)
               * (2 * n_pairs + 1) / 24.0
               - CAST(tie3 AS DOUBLE) / 48.0 <= 0.0
          THEN CAST(NULL AS DOUBLE)
          ELSE round((CAST(w2_plus AS DOUBLE) / 2.0
              - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4.0)
            / sqrt(CAST(n_pairs AS DOUBLE) * (n_pairs + 1)
                * (2 * n_pairs + 1) / 24.0
                - CAST(tie3 AS DOUBLE) / 48.0), 6)
          END AS z
      FROM agg""")),

    // ---- Brown-Forsythe --------------------------------------------------
    // do the event types carry the SAME SPREAD of value? (the variance
    // gate q159's location test silently assumes) — ANOVA F over |v −
    // group lower median| on the value grain.
    Q("q169_brown_forsythe", (s, d) =>
      Stats.brownForsythe(Tables.events(s, d), "event_type", "value"),
      Some("""
        WITH base AS (SELECT CAST(event_type AS VARCHAR) AS g,
                CAST(round(value * 1e6) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND value IS NOT NULL),
        cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
        cum AS (SELECT g, v, c,
                CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cm,
                CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS ng
              FROM cells),
        med AS (SELECT g, min(v) AS med FROM cum
              WHERE cm * 2 >= ng GROUP BY 1),
        per AS (SELECT cells.g, CAST(sum(c) AS BIGINT) AS ng,
                CAST(sum(c * abs(v - med)) AS BIGINT) AS sg,
                sum(CAST(c AS HUGEINT) * abs(v - med) * abs(v - med)) AS qg
              FROM cells JOIN med ON cells.g = med.g GROUP BY 1),
        terms AS (SELECT ng, sg, qg,
                CAST(round(1e6 * CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                  / ng) AS HUGEINT) AS term
              FROM per),
        agg AS (SELECT CAST(coalesce(sum(ng), 0) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_all,
                coalesce(sum(qg), 0) AS q_all,
                coalesce(sum(term), 0) AS t_all
              FROM terms)
        SELECT n, n_groups,
          CASE WHEN n_groups < 2 OR n <= n_groups THEN CAST(NULL AS BIGINT)
            WHEN CAST(q_all AS DOUBLE) - CAST(t_all AS DOUBLE) / 1e6 <= 0.0
            THEN CAST(NULL AS BIGINT)
            ELSE CAST(round(1e6
              * ((CAST(t_all AS DOUBLE) / 1e6
                  - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) / n)
                 / (n_groups - 1))
              / ((CAST(q_all AS DOUBLE) - CAST(t_all AS DOUBLE) / 1e6)
                 / (n - n_groups))) AS BIGINT)
            END AS f_micro
        FROM agg""")),

    // ---- Dunn post-hoc + BH ------------------------------------------------
    // q159 says the event types differ somewhere — WHICH pairs? k-row
    // group table self-joined (C(5,2) = 10 pairs), Lin-approximated
    // two-sided p, BH-FDR family closer.
    Q("q170_dunn_fdr", (s, d) =>
      Stats.dunnPosthoc(Tables.events(s, d), "event_type", "value"),
      Some("""
        WITH base AS (SELECT CAST(event_type AS VARCHAR) AS g,
                CAST(round(value * 1e6) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND value IS NOT NULL),
        pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY 1),
        dm AS (SELECT v,
                2 * (CAST(sum(t) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - t) + t + 1 AS dr
              FROM pv),
        gvc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
        per AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
                CAST(sum(c * dr) AS BIGINT) AS r2
              FROM gvc JOIN dm USING (v) GROUP BY 1),
        tie AS (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS n,
                coalesce(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS tie3
              FROM pv),
        pz AS (SELECT a.g || '|' || b.g AS k,
                CASE WHEN n < 2
                    OR CAST(n AS DOUBLE) * (n + 1) / 12.0
                       - CAST(tie3 AS DOUBLE) / (12.0 * (n - 1)) <= 0.0
                  THEN CAST(NULL AS DOUBLE)
                  ELSE abs(CAST(a.r2 AS DOUBLE) / (2.0 * a.ng)
                      - CAST(b.r2 AS DOUBLE) / (2.0 * b.ng))
                    / sqrt((CAST(n AS DOUBLE) * (n + 1) / 12.0
                        - CAST(tie3 AS DOUBLE) / (12.0 * (n - 1)))
                      * (1.0 / a.ng + 1.0 / b.ng))
                  END AS z
              FROM per a JOIN per b ON a.g < b.g CROSS JOIN tie),
        p AS (SELECT k,
                CAST(round(1e6 * least(1.0,
                  2.0 * exp(-0.717 * z - 0.416 * z * z))) AS BIGINT)
                  AS p_micro
              FROM pz WHERE z IS NOT NULL),
        r AS (SELECT k, p_micro,
                CAST(row_number() OVER (ORDER BY p_micro, k) AS BIGINT) AS rn,
                CAST(count(*) OVER () AS BIGINT) AS m
              FROM p),
        v AS (SELECT k, p_micro, rn,
                least(1000000, CAST(round(m * CAST(p_micro AS DOUBLE) / rn)
                  AS BIGINT)) AS v
              FROM r)
        SELECT k, p_micro, rn,
          CAST(min(v) OVER (ORDER BY rn DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS p_adj_micro
        FROM v""")),

    // ---- Ljung-Box -------------------------------------------------------
    // is each type's daily series white noise over the first 7 lags,
    // jointly? Pure composition over q147's acf plan.
    Q("q171_ljung_box", (s, d) =>
      TimeSeries.ljungBox(Tables.events(s, d), "event_type", "ts", 7),
      Some("""
        WITH obs AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS x
              FROM events GROUP BY 1, 2),
        spans AS (SELECT grp, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
        dense AS (SELECT grp, CAST(unnest(generate_series(d0, d1,
                INTERVAL 1 DAY)) AS DATE) AS d FROM spans),
        daily AS (SELECT dense.grp, dense.d,
                CAST(coalesce(obs.x, 0) AS BIGINT) AS x
              FROM dense LEFT JOIN obs
                ON obs.grp = dense.grp AND obs.d = dense.d),
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
                GROUP BY 1, 2),
        acf AS (SELECT den.grp, lag, n_days,
                CASE WHEN den = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(round(1e6 * CAST(num AS DOUBLE) / den) AS BIGINT)
                END AS acf_micro
              FROM den JOIN pairs ON den.grp = pairs.grp),
        tm AS (SELECT grp, n_days,
                CAST(round(1e9
                  * (CAST(acf_micro AS DOUBLE) / 1e6)
                  * (CAST(acf_micro AS DOUBLE) / 1e6)
                  / (n_days - lag)) AS BIGINT) AS term
              FROM acf WHERE acf_micro IS NOT NULL),
        gq AS (SELECT grp, CAST(max(n_days) AS BIGINT) AS n_days,
                CAST(count(*) AS BIGINT) AS h_lags,
                CAST(sum(term) AS BIGINT) AS s_nano
              FROM tm GROUP BY 1)
        SELECT grp, n_days, h_lags,
          CAST(round(1e6 * CAST(n_days AS DOUBLE) * (n_days + 2)
            * (CAST(s_nano AS DOUBLE) / 1e9)) AS BIGINT) AS q_micro
        FROM gq""")),

    // ---- EWMA ------------------------------------------------------------
    // 14-day truncated exponential smoothing of each type's daily counts;
    // weights are ONE driver-side table, embedded verbatim in both
    // engines (pow() ULPs can't diverge what neither engine computes).
    Q("q172_ewma", (s, d) =>
      TimeSeries.ewmaDaily(Tables.events(s, d), "event_type", "ts",
        EwmaAlpha, EwmaWindow),
      Some(s"""
        WITH obs AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
        spans AS (SELECT grp, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
        dense AS (SELECT grp, CAST(unnest(generate_series(d0, d1,
                INTERVAL 1 DAY)) AS DATE) AS d FROM spans),
        daily AS (SELECT dense.grp, dense.d,
                CAST(coalesce(obs.x, 0) AS BIGINT) AS x
              FROM dense LEFT JOIN obs
                ON obs.grp = dense.grp AND obs.d = dense.d),
        idx AS (SELECT grp, d, x,
                CAST(row_number() OVER (PARTITION BY grp ORDER BY d)
                  AS BIGINT) AS rn
              FROM daily),
        w(j, w) AS (VALUES ${ewmaW.zipWithIndex
          .map { case (wm, j) => s"(CAST($j AS BIGINT), CAST($wm AS BIGINT))" }
          .mkString(", ")}),
        k AS (SELECT i.grp, i.rn,
                CAST(sum(w.w * i2.x) AS BIGINT) AS num,
                CAST(sum(w.w) AS BIGINT) AS den
              FROM idx i CROSS JOIN w
              JOIN idx i2 ON i2.grp = i.grp AND i2.rn = i.rn - w.j
              GROUP BY 1, 2)
        SELECT i.grp, i.d, i.x,
          CAST(round(1e6 * CAST(num AS DOUBLE) / den) AS BIGINT)
            AS ewma_micro
        FROM k JOIN idx i ON i.grp = k.grp AND i.rn = k.rn""")),

    // ---- readability -----------------------------------------------------
    // Flesch-Kincaid grade + reading ease from three exact counts (words,
    // terminal-punctuation sentences, vowel-run syllables): the classic
    // complexity features next to text_quality in a curation scorecard.
    Q("text_readability", (s, d) =>
      Tables.ts(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount("text").as("n_words"),
        TextAnalysis.sentenceCount("text").as("n_sents"),
        TextAnalysis.syllableCount("text").as("n_syll"))
        .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
          expr("""CAST(round(1e6
            |  * (0.39 * (CAST(n_words AS DOUBLE) / n_sents)
            |     + 11.8 * (CAST(n_syll AS DOUBLE) / n_words)
            |     - 15.59)) AS BIGINT)""".stripMargin).as("fk_grade_micro"),
          expr("""CAST(round(1e6
            |  * (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
            |     - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)))
            |  AS BIGINT)""".stripMargin).as("flesch_ease_micro")),
      Some("""
        WITH cnt AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
                  AS BIGINT)) AS n_sents,
                CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
                  AS n_syll
              FROM documents)
        SELECT doc_id, n_words, n_sents, n_syll,
          CAST(round(1e6
            * (0.39 * (CAST(n_words AS DOUBLE) / n_sents)
               + 11.8 * (CAST(n_syll AS DOUBLE) / n_words)
               - 15.59)) AS BIGINT) AS fk_grade_micro,
          CAST(round(1e6
            * (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
               - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)))
            AS BIGINT) AS flesch_ease_micro
        FROM cnt""")),

    // ---- retrieval ranking metrics ----------------------------------------
    // NDCG@10 / AP@10 / first-relevant-rank per query vector, with label
    // equality as the binary relevance signal and the corpus label count
    // as the ideal set size. Integer-exact per the determinism contract:
    // DCG terms are per-rank micro-rounded THEN summed, AP precision
    // terms ride the exact 1/2520 common denominator (LCM of 1..10), so
    // the only doubles are the two closing mirrored divisions.
    Q("sim_rank_eval", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 10
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 50)
      val topk = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k,
        broadcastCorpus = true)
      val lab = e.select(col("vec_id"), col("label"))
      val rel = topk
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("nl")), "neighbor_id")
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("ql")), "query_id")
        .withColumn("rel", (col("nl") === col("ql")).cast("long"))
      val wq = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      val perQ = rel
        .withColumn("cum", sum(col("rel")).over(
          wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("query_id"))
        .agg(min(when(col("rel") === 1L, col("rank"))).as("first_rel_rank"),
          sum(when(col("rel") === 1L,
            expr("CAST(round(1e6 / log2(rank + 1)) AS BIGINT)"))
            .otherwise(0L)).as("dcg_micro"),
          sum(col("rel") * col("cum") * expr("2520L div rank"))
            .as("ap_units"))
      val nrel = q.join(
          e.groupBy(col("label")).agg(count(lit(1)).as("cl")), "label")
        .select(col("vec_id").as("query_id"),
          (col("cl") - 1L).as("n_rel_corpus"))
      perQ.join(nrel, "query_id")
        .withColumn("idcg_micro", expr(
          s"""CASE WHEN n_rel_corpus < 1 THEN CAST(NULL AS BIGINT)
            |ELSE aggregate(sequence(1L, least(n_rel_corpus, ${k}L)), 0L,
            |  (acc, i) -> acc + CAST(round(1e6 / log2(i + 1)) AS BIGINT))
            |END""".stripMargin))
        .select(col("query_id"), col("n_rel_corpus"), col("first_rel_rank"),
          col("dcg_micro"), col("idcg_micro"),
          expr("""CASE WHEN idcg_micro IS NULL THEN CAST(NULL AS BIGINT)
            |ELSE CAST(round(1e6 * CAST(dcg_micro AS DOUBLE) / idcg_micro)
            |  AS BIGINT) END""".stripMargin).as("ndcg_micro"),
          expr(s"""CASE WHEN n_rel_corpus < 1 THEN CAST(NULL AS BIGINT)
            |ELSE CAST(round(1e6 * CAST(ap_units AS DOUBLE)
            |  / (2520.0 * least(n_rel_corpus, ${k}L))) AS BIGINT)
            |END""".stripMargin).as("ap_micro"))
    }, Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
            FROM embeddings WHERE vec_id < 50),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
            FROM embeddings),
      scored AS (SELECT query_id, ql, neighbor_id, nl,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY ${V.duckCosine("qv", "cv")} DESC, neighbor_id ASC)
                AS BIGINT) AS rank
            FROM q JOIN c ON query_id <> neighbor_id),
      rel AS (SELECT query_id, rank,
              CASE WHEN nl = ql THEN 1 ELSE 0 END AS rel
            FROM scored WHERE rank <= 10),
      cm AS (SELECT query_id, rank, rel,
              CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM rel),
      perq AS (SELECT query_id,
              CAST(min(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
                AS first_rel_rank,
              CAST(coalesce(sum(CASE WHEN rel = 1
                THEN CAST(round(1e6 / log2(rank + 1)) AS BIGINT)
                ELSE 0 END), 0) AS BIGINT) AS dcg_micro,
              CAST(coalesce(sum(rel * cum * (2520 // rank)), 0) AS BIGINT)
                AS ap_units
            FROM cm GROUP BY 1),
      nr AS (SELECT q.query_id,
              CAST(cnt.cl - 1 AS BIGINT) AS n_rel_corpus
            FROM q JOIN (SELECT label, count(*) AS cl FROM embeddings
              GROUP BY 1) cnt ON q.ql = cnt.label),
      jo AS (SELECT p.query_id, n_rel_corpus, first_rel_rank, dcg_micro,
              ap_units,
              CASE WHEN n_rel_corpus < 1 THEN CAST(NULL AS BIGINT)
              ELSE CAST(list_sum(list_transform(
                range(1, least(n_rel_corpus, 10) + 1),
                i -> CAST(round(1e6 / log2(i + 1)) AS BIGINT))) AS BIGINT)
              END AS idcg_micro
            FROM perq p JOIN nr ON p.query_id = nr.query_id)
      SELECT query_id, n_rel_corpus, first_rel_rank, dcg_micro, idcg_micro,
        CASE WHEN idcg_micro IS NULL THEN CAST(NULL AS BIGINT)
        ELSE CAST(round(1e6 * CAST(dcg_micro AS DOUBLE) / idcg_micro)
          AS BIGINT) END AS ndcg_micro,
        CASE WHEN n_rel_corpus < 1 THEN CAST(NULL AS BIGINT)
        ELSE CAST(round(1e6 * CAST(ap_units AS DOUBLE)
          / (2520.0 * least(n_rel_corpus, 10))) AS BIGINT)
        END AS ap_micro
      FROM jo""")),

    // ---- audio signal stats ------------------------------------------------
    // RMS / peak / zero-crossing / silence / clipping over REAL PCM16 WAV
    // decode (MediaCodec.decodeWavStats): payloads are constructed in SQL
    // from a shared formula, the engine decodes actual RIFF bytes, and
    // the oracle recomputes the stats from the formula — any decode drift
    // (offsets, sign extension, channel fold) breaks the hash.
    Q("mm_audio_stats", (s, d) => {
      val media = expr(audioStatsMediaSql)
      Tables.ts(s, d, "documents")
        .select(col("doc_id"), media.as("media"))
        .withColumn("st", AudioNative.audioStats(col("media")))
        .select(col("doc_id"),
          element_at(col("st"), 1).as("n_frames"),
          element_at(col("st"), 2).as("channels"),
          expr("""CAST(round(1e6 * sqrt(CAST(element_at(st, 4) AS DOUBLE)
            |  / element_at(st, 1))) AS BIGINT)""".stripMargin)
            .as("rms_micro"),
          element_at(col("st"), 5).as("max_abs"),
          element_at(col("st"), 6).as("zero_cross"),
          element_at(col("st"), 7).as("silence_frames"),
          element_at(col("st"), 8).as("clip_frames"))
    }, Some(s"""
      WITH s AS (SELECT doc_id, CAST(t.range AS BIGINT) AS i,
              ${wavSample("CAST(t.range AS BIGINT)")} AS m
            FROM documents CROSS JOIN range(64) t),
      st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
              CAST(sum(m * m) AS BIGINT) AS sum_sq,
              CAST(max(abs(m)) AS BIGINT) AS max_abs,
              CAST(sum(CASE WHEN abs(m) < 328 THEN 1 ELSE 0 END) AS BIGINT)
                AS silence_frames,
              CAST(sum(CASE WHEN abs(m) >= 30000 THEN 1 ELSE 0 END)
                AS BIGINT) AS clip_frames
            FROM s GROUP BY 1),
      zc AS (SELECT a.doc_id, CAST(count(*) AS BIGINT) AS zc
            FROM s a JOIN s b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            WHERE (b.m > 0 AND a.m < 0) OR (b.m < 0 AND a.m > 0)
            GROUP BY 1)
      SELECT st.doc_id, n_frames, CAST(1 AS BIGINT) AS channels,
        CAST(round(1e6 * sqrt(CAST(sum_sq AS DOUBLE) / n_frames))
          AS BIGINT) AS rms_micro,
        max_abs,
        CAST(coalesce(zc.zc, 0) AS BIGINT) AS zero_cross,
        silence_frames, clip_frames
      FROM st LEFT JOIN zc ON st.doc_id = zc.doc_id""")),

    // ---- audio perceptual envelope -----------------------------------------
    // REAL decodeWavEnvelope end-to-end against a first-principles SQL
    // mirror: 63 mono frames land 1:1 on the 63 envelope cells, so the
    // oracle can recompute |m| -> x255 div max -> dHash without any
    // decoder. Upgrades the WAV envelope path from spec-pinned constants
    // to a corpus-wide oracle row.
    Q("mm_audio_envelope", (s, d) => {
      val media = expr(audioClassMediaSql)
      Tables.ts(s, d, "documents")
        .select(col("doc_id"), media.as("media"))
        .select(col("doc_id"), graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("media")))
          .as("fp"))
    }, Some(s"""
      WITH $duckEnvelopeFpCtes
      SELECT doc_id, fp FROM efp""")),

    // ---- volume-invariant audio dedup ---------------------------------------
    // duplicate classes over the envelope fingerprint: same signal class
    // at x1 and x16 gain collapses to ONE fingerprint (the gain cancels
    // exactly in the integer normalization) — the audio analog of the
    // brightness-invariant image dHash dedup, grouped (not paired) so the
    // output stays class-grain at any corpus size.
    Q("mm_audio_dedup", (s, d) => {
      val media = expr(audioClassMediaSql)
      Tables.ts(s, d, "documents")
        .select(col("doc_id"), media.as("media"))
        .select(col("doc_id"), graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("media")))
          .as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
        .filter(col("n_docs") >= 2L)
    }, Some(s"""
      WITH $duckEnvelopeFpCtes
      SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(min(doc_id) AS BIGINT) AS rep_doc
      FROM efp GROUP BY 1 HAVING count(*) >= 2""")),

    // ---- Jonckheere-Terpstra ordered trend ----------------------------------
    // does order value TREND across the priority ladder 1-URGENT..5-LOW?
    // (the directional question q159's unordered KW can't ask) — dense
    // k x d grid, two bounded windows, exact doubled JT mass.
    Q("q179_jonckheere", (s, d) =>
      Stats.jonckheereTerpstra(t(s, d, "orders"), "o_orderpriority",
        "o_totalprice", valScale = 0.01),
      Some("""
        WITH base AS (SELECT CAST(o_orderpriority AS VARCHAR) AS g,
                CAST(round(o_totalprice * 0.01) AS BIGINT) AS v
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_totalprice IS NOT NULL),
        pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY 1),
        grps AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
              FROM base GROUP BY 1),
        cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
        dense AS (SELECT grps.g, pv.v, CAST(coalesce(c, 0) AS BIGINT) AS cg
              FROM grps CROSS JOIN pv
              LEFT JOIN cells ON cells.g = grps.g AND cells.v = pv.v),
        wb AS (SELECT g, v, cg,
                CAST(coalesce(sum(cg) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS below
              FROM dense),
        ab AS (SELECT g, v, cg,
                CAST(coalesce(sum(below) OVER (PARTITION BY v ORDER BY g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS a,
                CAST(coalesce(sum(cg) OVER (PARTITION BY v ORDER BY g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS b
              FROM wb),
        jt AS (SELECT CAST(coalesce(sum(cg * (2 * a + b)), 0) AS BIGINT)
                AS jt2 FROM ab),
        gm AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS k,
                coalesce(sum(CAST(ng AS HUGEINT) * ng), 0) AS s2g,
                coalesce(sum(CAST(ng AS HUGEINT) * (ng - 1)
                  * (2 * ng + 5)), 0) AS g25,
                coalesce(sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2)),
                  0) AS g3,
                coalesce(sum(CAST(ng AS HUGEINT) * (ng - 1)), 0) AS g2
              FROM grps),
        tm AS (SELECT
                coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                  0) AS t25,
                coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2)), 0)
                  AS t3,
                coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0) AS t2
              FROM pv),
        vr AS (SELECT n, k, jt2, s2g,
                CASE WHEN k < 2 OR n < 3 THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                    - CAST(g25 AS DOUBLE) - CAST(t25 AS DOUBLE)) / 72.0
                  + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
                    / (36.0 * n * (n - 1) * (n - 2))
                  + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
                    / (8.0 * n * (n - 1))
                END AS varr
              FROM jt CROSS JOIN gm CROSS JOIN tm)
        SELECT n, k AS n_groups, jt2,
          CASE WHEN varr IS NULL OR varr <= 0.0 THEN CAST(NULL AS BIGINT)
          ELSE CAST(round(1e6
            * (CAST(jt2 AS DOUBLE) / 2.0
               - (CAST(n AS DOUBLE) * n - CAST(s2g AS DOUBLE)) / 4.0)
            / sqrt(varr)) AS BIGINT)
          END AS z_micro
        FROM vr""")),

    // ---- video motion profile -----------------------------------------------
    // consecutive-frame L1 luma distance over the REAL GIF decode — the
    // scene-cut / static-clip signal; oracle straight from the
    // SyntheticGif generating formula.
    Q("mm_video_motion", (s, d) => {
      val docs = Tables.ts(s, d, "documents").select(col("doc_id"))
        .withColumn("media", expr(SyntheticGif.mediaSql("doc_id")))
      graft.operators.Multimodal
        .videoFrameMotion(docs, "doc_id", "media")
        .withColumnRenamed("id", "doc_id")
    }, Some(s"""
      WITH ${SyntheticGif.duckFramesCte()}
      SELECT a.doc_id, a.frame_idx AS frame_a, b.frame_idx AS frame_b,
        CAST(list_sum(list_transform(range(1, 64), i ->
          abs(a.cells[CAST(i AS INT)] - b.cells[CAST(i AS INT)])))
          AS BIGINT) AS motion_l1
      FROM g a JOIN g b
        ON b.doc_id = a.doc_id AND b.frame_idx = a.frame_idx + 1""")),

    // ---- streaming audio quality gate ---------------------------------------
    // the multimodal x streaming composition: documents arrive as a
    // stream, each constructs its WAV payload, the REAL PCM decode runs
    // inside the micro-batch (AudioNative is a plain expression — no
    // state), and the per-source admission rollup (clip-free AND <25%
    // silence) accumulates in complete mode. Oracle = the batch
    // semantics from the generating formula.
    Q("mm_stream_audio_gate", (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val sch = Tables.t(s, d, "documents").schema
      val docs = s.readStream.schema(sch)
        .parquet(Tables.stagedStreamDir(d, "documents"))
      val agg = docs
        .select(col("source"), expr(audioStatsMediaSql).as("media"))
        .withColumn("st", AudioNative.audioStats(col("media")))
        .select(col("source"),
          element_at(col("st"), 1).as("nf"),
          element_at(col("st"), 7).as("silence"),
          element_at(col("st"), 8).as("clip"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("clip") === 0L && col("silence") * 4 < col("nf"),
            1L).otherwise(0L)).as("n_pass"),
          sum(when(col("clip") > 0L, 1L).otherwise(0L)).as("n_clipped"))
      val q = agg.writeStream.format("memory")
        .queryName("mm_audio_stream")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("mm_audio_stream")
    }, Some(s"""
      WITH sa AS (SELECT doc_id, source,
              ${wavSample("CAST(t.range AS BIGINT)")} AS m
            FROM documents CROSS JOIN range(64) t),
      st AS (SELECT doc_id, source,
              CAST(count(*) AS BIGINT) AS nf,
              CAST(sum(CASE WHEN abs(m) < 328 THEN 1 ELSE 0 END)
                AS BIGINT) AS silence,
              CAST(sum(CASE WHEN abs(m) >= 30000 THEN 1 ELSE 0 END)
                AS BIGINT) AS clip
            FROM sa GROUP BY 1, 2)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN clip = 0 AND silence * 4 < nf
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        CAST(sum(CASE WHEN clip > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped
      FROM st GROUP BY 1""")),

    // ---- segment perceptual probe (batch vs corpus) -------------------------
    // the incremental admission shape of mm_segment_dedup: every 10th doc
    // arrives as a probe batch and asks which STORED segments it
    // near-matches — probe-chunks x corpus-chunks is the only join, so
    // cost tracks the batch (the all-pairs form is quadratic in stored
    // media by construction on low-entropy payloads; BASELINE r14 note).
    Q("mm_segment_probe", (s, d) => {
      val bin = Tables.ts(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      graft.operators.Multimodal.segmentPhashProbe(
        bin.filter(col("doc_id") % 10 =!= 0),
        bin.filter(col("doc_id") % 10 === 0),
        "doc_id", "media", nSegs = 4, maxHamming = 6)
    }, Some {
      import graft.operators.PerceptualHash
      s"""
      WITH b AS (SELECT doc_id, hex(encode(text)) AS hxf,
                   octet_length(encode(text)) AS bn
                 FROM documents
                 WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
      sg AS (SELECT doc_id, seg, (seg * bn) // 4 AS st,
               ((seg + 1) * bn) // 4 AS en, hxf
             FROM b CROSS JOIN range(0, 4) t(seg)
             WHERE ((seg + 1) * bn) // 4 > (seg * bn) // 4),
      sb AS (SELECT doc_id, seg,
               substring(hxf, CAST(2 * st + 1 AS INT),
                 CAST(2 * (en - st) AS INT)) AS hx,
               en - st AS bn
             FROM sg),
      c AS (SELECT doc_id, seg,
              ${PerceptualHash.duckGridCells("hx", "bn")} AS cells
            FROM sb),
      f0 AS (SELECT doc_id, seg,
               ${PerceptualHash.duckDHashBits("cells")} AS f
             FROM c),
      f AS (SELECT * FROM f0 WHERE f <> 0),
      ck AS (SELECT doc_id, seg, f,
               unnest(${PerceptualHash.duckChunks("f")}) AS ck
             FROM f)
      SELECT DISTINCT p.doc_id AS probe_id, p.seg AS probe_seg,
             c2.doc_id AS match_id, c2.seg AS match_seg,
             CAST(bit_count(xor(p.f, c2.f)) AS BIGINT) AS hamming
      FROM ck p JOIN ck c2 ON p.ck = c2.ck
      WHERE p.doc_id % 10 = 0 AND c2.doc_id % 10 <> 0
        AND bit_count(xor(p.f, c2.f)) <= 6"""
    }),

    // ---- classifier eval metrics -------------------------------------------
    // MCC + Brier + ECE for the q87/q114 quality classifier: the
    // single-number scorecard (balance-robust accuracy, proper score,
    // calibration gap) next to the per-bin reliability diagram.
    Q("q175_eval_metrics", (s, d) => {
      val nt = size(split(col("text"), " "))
      val feat = t(s, d, "documents").select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("label"),
        lit(1.0).as("x0"),
        (nt.cast("double") / lit(100.0)).as("x1"),
        (col("n_chars").cast("double") / nt / lit(10.0)).as("x2"),
        (size(array_distinct(split(col("text"), " "))).cast("double") / nt)
          .as("x3"))
      graft.operators.Classifier.evalMetrics(feat,
        Seq("x0", "x1", "x2", "x3"), steps = 3, lr = 0.25, bins = 10)
    }, Some(graft.operators.Classifier.evalMetricsOracleSql(
      Curation.lrFeatSql, Seq("x0", "x1", "x2", "x3"), steps = 3,
      lr = 0.25, bins = 10))),

    // ---- log-rank test -------------------------------------------------------
    // do even and odd user cohorts churn at the same rate? q93's
    // 30th-event churn proxy split into two cohorts, compared by the
    // hypergeometric O-E machinery over pooled event times.
    Q("q176_logrank", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val per = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("ts"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(min(col("us")).as("f"),
          max(when(col("rn") === 30, col("us"))).as("kth"),
          max(col("us")).as("l"))
      val subj = per.select(
        expr("CAST(user_id % 2 AS STRING)").as("cohort"),
        expr("(coalesce(kth, l) - f) div 86400000000L").as("dur"),
        col("kth").isNotNull.cast("long").as("obs"))
      graft.operators.Survival.logRank(subj, "cohort", "dur", "obs",
        "0", "1")
    }, Some("""
      WITH ranked AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS rn
                      FROM events),
      per AS (SELECT user_id, min(us) AS f,
                max(CASE WHEN rn = 30 THEN us END) AS kth, max(us) AS l
              FROM ranked GROUP BY 1),
      subj AS (SELECT CAST(user_id % 2 AS VARCHAR) AS g,
                (coalesce(kth, l) - f) // 86400000000 AS t,
                CASE WHEN kth IS NOT NULL THEN 1 ELSE 0 END AS obs
               FROM per),
      tot AS (SELECT CAST(sum(CASE WHEN g = '0' THEN 1 ELSE 0 END)
                AS BIGINT) AS n1,
                CAST(count(*) AS BIGINT) AS n FROM subj),
      byt AS (SELECT t,
                CAST(sum(CASE WHEN g = '0' THEN obs ELSE 0 END) AS BIGINT)
                  AS d1,
                CAST(sum(obs) AS BIGINT) AS dt,
                CAST(sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS BIGINT)
                  AS c1,
                CAST(count(*) AS BIGINT) AS ct
              FROM subj GROUP BY 1),
      cw AS (SELECT t, d1, dt, c1, ct,
              CAST(coalesce(sum(c1) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS left1,
              CAST(coalesce(sum(ct) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS leftt
            FROM byt),
      r AS (SELECT d1, dt, n1 - left1 AS n1t, n - leftt AS nt, n1, n
            FROM cw, tot WHERE dt > 0),
      terms AS (SELECT d1, dt, n1, n,
              CAST(round(1e9 * CAST(dt AS DOUBLE) * n1t / nt) AS BIGINT)
                AS e_nano,
              CASE WHEN nt <= 1 THEN 0
              ELSE CAST(round(1e9 * CAST(dt AS DOUBLE) * n1t * (nt - n1t)
                  * (nt - dt)
                / (CAST(nt AS DOUBLE) * nt * (nt - 1))) AS BIGINT)
              END AS v_nano
            FROM r),
      agg AS (SELECT CAST(max(n1) AS BIGINT) AS n_a,
              CAST(max(n) - max(n1) AS BIGINT) AS n_b,
              CAST(count(*) AS BIGINT) AS n_times,
              CAST(coalesce(sum(d1), 0) AS BIGINT) AS o_a,
              CAST(coalesce(sum(e_nano), 0) AS BIGINT) AS e_a_nano,
              CAST(coalesce(sum(v_nano), 0) AS BIGINT) AS v_nano
            FROM terms)
      SELECT n_a, n_b, n_times, o_a, e_a_nano, v_nano,
        CASE WHEN v_nano <= 0 THEN CAST(NULL AS BIGINT)
        ELSE CAST(round(1e6
          * (CAST(o_a AS DOUBLE) - CAST(e_a_nano AS DOUBLE) / 1e9)
          * (CAST(o_a AS DOUBLE) - CAST(e_a_nano AS DOUBLE) / 1e9)
          / (CAST(v_nano AS DOUBLE) / 1e9)) AS BIGINT)
        END AS chi2_micro
      FROM agg""")),

    // ---- Nelson-Aalen cumulative hazard --------------------------------------
    // the additive hazard companion to q93's Kaplan-Meier, same subjects.
    Q("q177_nelson_aalen", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val per = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("ts"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(min(col("us")).as("f"),
          max(when(col("rn") === 30, col("us"))).as("kth"),
          max(col("us")).as("l"))
      val subj = per.select(
        expr("(coalesce(kth, l) - f) div 86400000000L").as("dur"),
        col("kth").isNotNull.cast("long").as("obs"))
      graft.operators.Survival.nelsonAalen(subj, "dur", "obs")
    }, Some("""
      WITH ranked AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS rn
                      FROM events),
      per AS (SELECT user_id, min(us) AS f,
                max(CASE WHEN rn = 30 THEN us END) AS kth, max(us) AS l
              FROM ranked GROUP BY 1),
      subj AS (SELECT (coalesce(kth, l) - f) // 86400000000 AS t,
                CASE WHEN kth IS NOT NULL THEN 1 ELSE 0 END AS obs
               FROM per),
      tot AS (SELECT count(*) AS n FROM subj),
      byt AS (SELECT t, CAST(sum(obs) AS BIGINT) AS d, count(*) AS c
              FROM subj GROUP BY 1),
      cw AS (SELECT t, d, c,
              CAST(coalesce(sum(c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS left_before
            FROM byt),
      r AS (SELECT t, d, CAST(n - left_before AS BIGINT) AS n_risk
            FROM cw, tot WHERE d > 0),
      costs AS (SELECT t, d, n_risk,
          CAST(round(d::DOUBLE / n_risk * 1e9) AS BIGINT) AS h_nano
        FROM r)
      SELECT t, n_risk, d AS n_event,
             CAST(sum(h_nano) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_hazard_nano
      FROM costs""")),

    // ---- Anderson-Darling k-sample ----------------------------------------
    // do the five event types share ONE value distribution, with tail
    // sensitivity? (AD's 1/(F(1-F)) weight catches tail drift the KS
    // family underweights) — midrank-exact doubled units, per-cell
    // micro-rounded terms in DECIMAL.
    Q("q178_anderson_darling", (s, d) =>
      Stats.andersonDarlingK(Tables.events(s, d), "event_type", "value"),
      Some("""
        WITH base AS (SELECT CAST(event_type AS VARCHAR) AS g,
                CAST(round(value * 1e6) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND value IS NOT NULL),
        pv AS (SELECT v, CAST(count(*) AS BIGINT) AS h FROM base GROUP BY 1),
        pooled AS (SELECT v, h,
                2 * CAST(sum(h) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - h AS b2
              FROM pv),
        grps AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
              FROM base GROUP BY 1),
        tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM grps),
        cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
        dense AS (SELECT grps.g, ng, pooled.v, h, b2,
                CAST(coalesce(cells.c, 0) AS BIGINT) AS hg
              FROM grps CROSS JOIN pooled
              LEFT JOIN cells ON cells.g = grps.g AND cells.v = pooled.v),
        mm AS (SELECT g, ng, v, h, b2,
                2 * CAST(sum(hg) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - hg AS m2
              FROM dense),
        terms AS (SELECT n,
                CAST(round(1e6 * h
                  * (CAST(n AS DOUBLE) * m2 - CAST(ng AS DOUBLE) * b2)
                  * (CAST(n AS DOUBLE) * m2 - CAST(ng AS DOUBLE) * b2)
                  / ((CAST(b2 AS DOUBLE) * (2 * n - b2)
                      - CAST(n AS DOUBLE) * h) * ng))
                  AS HUGEINT) AS t_micro
              FROM mm CROSS JOIN tot
              WHERE CAST(b2 AS HUGEINT) * (2 * n - b2)
                - CAST(n AS HUGEINT) * h > 0),
        agg AS (SELECT coalesce(sum(t_micro), 0) AS s_micro,
                CAST(max(n) AS BIGINT) AS n FROM terms),
        gc AS (SELECT CAST(count(*) AS BIGINT) AS n_groups FROM grps),
        vc AS (SELECT CAST(count(*) AS BIGINT) AS n_values FROM pv)
        SELECT n, n_groups, n_values,
          CASE WHEN n_groups < 2 OR n_values < 2 OR n IS NULL
            THEN CAST(NULL AS BIGINT)
          ELSE CAST(round(CAST(s_micro AS DOUBLE) * (n - 1) / n / n)
            AS BIGINT)
          END AS a2_micro
        FROM agg CROSS JOIN gc CROSS JOIN vc""")),

    // ---- matrix profile ---------------------------------------------------
    // which week of each type's daily traffic matches NOTHING else in the
    // series (discord = anomaly) and which repeats (motif)? Exact
    // non-normalized profile, m=7, exclusion zone 3.
    Q("q173_matrix_profile", (s, d) =>
      TimeSeries.matrixProfile(Tables.events(s, d), "event_type", "ts", 7),
      Some("""
        WITH obs AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS x
              FROM events GROUP BY 1, 2),
        spans AS (SELECT grp, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
        dense AS (SELECT grp, CAST(unnest(generate_series(d0, d1,
                INTERVAL 1 DAY)) AS DATE) AS d FROM spans),
        daily AS (SELECT dense.grp, dense.d,
                CAST(coalesce(obs.x, 0) AS BIGINT) AS x
              FROM dense LEFT JOIN obs
                ON obs.grp = dense.grp AND obs.d = dense.d),
        idx AS (SELECT grp, d, x,
                CAST(row_number() OVER (PARTITION BY grp ORDER BY d)
                  AS BIGINT) AS rn,
                CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
              FROM daily),
        wins AS (SELECT i.grp, i.rn AS i, CAST(t.range AS BIGINT) AS t,
                  i2.x AS v
                FROM idx i CROSS JOIN range(7) t
                JOIN idx i2 ON i2.grp = i.grp AND i2.rn = i.rn + t.range
                WHERE i.rn <= i.n - 6),
        pairs AS (SELECT a.grp, a.i, b.i AS j,
                  CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist
                FROM wins a JOIN wins b
                  ON b.grp = a.grp AND b.t = a.t AND b.i > a.i + 3
                GROUP BY 1, 2, 3),
        sym AS (SELECT grp, i, j, dist FROM pairs
                UNION ALL
                SELECT grp, j AS i, i AS j, dist FROM pairs),
        prof AS (SELECT grp, i, dist, j,
                  row_number() OVER (PARTITION BY grp, i
                    ORDER BY dist, j) AS rk
                FROM sym)
        SELECT idx.grp, idx.d, idx.rn AS win_start, p.dist AS p_dist,
               p.j AS nn_idx
        FROM idx LEFT JOIN prof p
          ON p.grp = idx.grp AND p.i = idx.rn AND p.rk = 1
        WHERE idx.rn <= idx.n - 6""")),

    // ---- runs test ---------------------------------------------------------
    // is each type's above/below-median daily pattern random in time?
    // (clustering = trend/regime; alternation = overdispersion)
    Q("q174_runs_test", (s, d) =>
      TimeSeries.runsTest(Tables.events(s, d), "event_type", "ts"),
      Some("""
        WITH obs AS (SELECT event_type AS grp,
                CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS x
              FROM events GROUP BY 1, 2),
        spans AS (SELECT grp, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
        dense AS (SELECT grp, CAST(unnest(generate_series(d0, d1,
                INTERVAL 1 DAY)) AS DATE) AS d FROM spans),
        daily AS (SELECT dense.grp, dense.d,
                CAST(coalesce(obs.x, 0) AS BIGINT) AS x
              FROM dense LEFT JOIN obs
                ON obs.grp = dense.grp AND obs.d = dense.d),
        vg AS (SELECT grp, x, CAST(count(*) AS BIGINT) AS c
              FROM daily GROUP BY 1, 2),
        cum AS (SELECT grp, x, c,
                CAST(sum(c) OVER (PARTITION BY grp ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cm,
                CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS nd
              FROM vg),
        med AS (SELECT grp, min(x) AS med FROM cum
              WHERE cm * 2 >= nd GROUP BY 1),
        sgn AS (SELECT daily.grp, d,
                CASE WHEN x > med THEN 1 ELSE -1 END AS s
              FROM daily JOIN med ON daily.grp = med.grp
              WHERE x <> med),
        brk AS (SELECT grp, s,
                CASE WHEN lag(s) OVER (PARTITION BY grp ORDER BY d) IS NULL
                  OR lag(s) OVER (PARTITION BY grp ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS brk
              FROM sgn),
        agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_plus,
                CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_minus,
                CAST(sum(brk) AS BIGINT) AS n_runs
              FROM brk GROUP BY 1)
        SELECT grp, n_days, n_plus, n_minus, n_runs,
          CASE WHEN n_days < 2 OR n_plus = 0 OR n_minus = 0
              OR 2.0 * n_plus * n_minus * (2.0 * n_plus * n_minus - n_days)
                 <= 0.0
            THEN CAST(NULL AS BIGINT)
            ELSE CAST(round(1e6 * (CAST(n_runs AS DOUBLE)
                - (2.0 * n_plus * n_minus / n_days + 1.0))
              / sqrt(2.0 * n_plus * n_minus
                  * (2.0 * n_plus * n_minus - n_days)
                  / (CAST(n_days AS DOUBLE) * n_days * (n_days - 1))))
              AS BIGINT)
            END AS z_micro
        FROM agg"""))
  )
}
