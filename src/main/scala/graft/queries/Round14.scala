package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{HashExprs => H}
import graft.operators.{Pii, Stats, TextAnalysis}

/** Round-14 queries — the curation-pipeline growth set:
  *  - q166_drift_fdr: the drift→FDR composed pipeline (the advertised
  *    chain q164 + q161 were built for), oracle-checked end to end;
  *  - text_line_dedup: CCNet line-level boilerplate removal;
  *  - text_pii_scan / text_pii_rate: the PII scrub stage + exposure report;
  *  - text_doremi_mixture: DoReMi excess-loss domain reweighting;
  *  - text_seq_pack / text_pack_bins: global concat-and-chunk packing;
  *  - dedup_exact_span: Lee-et-al exact duplicated-substring scrub;
  *  - q167_bradley_terry: pairwise-preference strength fit (Hunter MM).
  * Iterative oracles (doremi, bradley-terry) mark every multi-referenced
  * round CTE `AS MATERIALIZED` — DuckDB otherwise INLINES each reference
  * and the doubled-per-round expansion re-opens the scanned parquet
  * exponentially many times (observed as fd exhaustion at 10 rounds). */
object Round14 {
  import Tables.t

  /** Synthetic multi-line documents for the line-dedup family: a global
    * boilerplate line (df = corpus size), a per-source template line
    * (df = source size), then the doc's own words in 10-word lines —
    * the construct half of the construct→process→oracle pattern (the
    * testdata text is a single-line word stream, so line structure is
    * built, deterministically, from doc fields). */
  private[graft] val lineAugSpark: String =
    """concat('ACCEPT COOKIES TO CONTINUE', chr(10),
      |  'via ', source, chr(10),
      |  array_join(transform(
      |    sequence(0, CAST((size(split(text, ' ')) + 9) div 10 AS INT) - 1),
      |    i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' ')),
      |    chr(10)))""".stripMargin

  private val lineAugDuck: String =
    """'ACCEPT COOKIES TO CONTINUE' || chr(10)
      |  || 'via ' || source || chr(10)
      |  || array_to_string(list_transform(
      |       range(0, (len(string_split(text, ' ')) + 9) // 10),
      |       i -> array_to_string(list_slice(string_split(text, ' '),
      |              CAST(i * 10 + 1 AS INT), CAST(i * 10 + 10 AS INT)), ' ')),
      |       chr(10))""".stripMargin

  /** Deterministic PII injection (emails / phones / IPv4s / ID runs
    * keyed off doc_id) appended to the raw text — the oracle re-runs the
    * IDENTICAL regex pipeline, so injected and any natural hits are
    * both covered; injection just guarantees the scan has work. */
  private def piiAug(cast: String): String =
    s"""text
       |  || CASE WHEN doc_id % 3 = 0 THEN ' user' || CAST(doc_id % 100 AS $cast)
       |            || '@mail' || CAST(doc_id % 10 AS $cast) || '.net'
       |     ELSE '' END
       |  || CASE WHEN doc_id % 3 = 1 THEN ' 555-123-'
       |            || lpad(CAST(doc_id % 10000 AS $cast), 4, '0')
       |     ELSE '' END
       |  || CASE WHEN doc_id % 3 = 2 THEN ' 10.0.' || CAST(doc_id % 256 AS $cast)
       |            || '.' || CAST((doc_id * 7) % 256 AS $cast)
       |     ELSE '' END
       |  || CASE WHEN doc_id % 5 = 0 THEN ' ' || lpad(CAST(doc_id AS $cast), 12, '0')
       |     ELSE '' END""".stripMargin

  /** The q164 one-vs-rest KS CTE chain, factored so a multi-family FDR
    * composition can instantiate it per feature without 40-line
    * duplication. `pfx` namespaces the CTEs; `fromSql` supplies the
    * integerized (g, v) base select. Ends in `${pfx}ks(grp, p_micro)`. */
  private def duckKs(pfx: String, fromSql: String): String =
    s"""${pfx}base AS ($fromSql),
       |${pfx}pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t
       |      FROM ${pfx}base GROUP BY 1),
       |${pfx}pooled AS (SELECT v, CAST(sum(t) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cuma FROM ${pfx}pv),
       |${pfx}grps AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
       |      FROM ${pfx}base GROUP BY 1),
       |${pfx}tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM ${pfx}grps),
       |${pfx}cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |      FROM ${pfx}base GROUP BY 1, 2),
       |${pfx}dense AS (SELECT ${pfx}grps.g AS g, ng, ${pfx}pooled.v AS v,
       |        cuma, coalesce(c, 0) AS c0
       |      FROM ${pfx}grps CROSS JOIN ${pfx}pooled
       |      LEFT JOIN ${pfx}cells ON ${pfx}grps.g = ${pfx}cells.g
       |        AND ${pfx}pooled.v = ${pfx}cells.v),
       |${pfx}cum AS (SELECT g, ng, v, cuma,
       |        CAST(sum(c0) OVER (PARTITION BY g ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cumg
       |      FROM ${pfx}dense),
       |${pfx}nm AS (SELECT g, ng, v, n,
       |        abs(cumg * (n - ng) - (cuma - cumg) * ng) AS num
       |      FROM ${pfx}cum CROSS JOIN ${pfx}tot),
       |${pfx}pick AS (SELECT g, ng, v, num, n,
       |        row_number() OVER (PARTITION BY g
       |          ORDER BY num DESC, v ASC) AS pick
       |      FROM ${pfx}nm),
       |${pfx}ks AS (SELECT g AS grp,
       |    CAST(round(1e6 * least(1.0, 2.0 * exp(
       |      -2.0 * (CAST(ng AS DOUBLE) * (n - ng) / n)
       |      * (CAST(num AS DOUBLE) / (CAST(ng AS DOUBLE) * (n - ng)))
       |      * (CAST(num AS DOUBLE) / (CAST(ng AS DOUBLE) * (n - ng)))
       |      ))) AS BIGINT) AS p_micro
       |  FROM ${pfx}pick WHERE pick = 1 AND ng < n AND ng > 0)""".stripMargin

  def defs: Seq[Q] = Seq(
    // ---- drift audit -> FDR-significant groups, end to end ---------------
    // the composed pipeline q164 and q161 advertise: TWO one-vs-rest KS
    // drift families (per-source document length, per-event-type value)
    // pooled into ONE BH family, adjusted together, significance read at
    // FDR q = 0.05. Scale posture is the components': value-grain KS
    // grids (ENFORCED compact), sharded GlobalRank rank + suffix-min for
    // BH — no corpus-grain window anywhere in the chain.
    Q("q166_drift_fdr", (s, d) => {
      val doclen = Stats.ksDriftOneVsRest(
          t(s, d, "documents"), "source", "n_chars", valScale = 1.0)
        .select(concat(lit("doclen:"), col("grp")).as("grp"),
          col("p_micro"))
      val evval = Stats.ksDriftOneVsRest(
          Tables.events(s, d), "event_type", "value", valScale = 10.0)
        .select(concat(lit("evval:"), col("grp")).as("grp"),
          col("p_micro"))
      Stats.bhAdjust(doclen.unionAll(evval), "grp", "p_micro")
        .withColumn("sig", col("p_adj_micro") <= 50000L)
    }, Some(s"""
      WITH ${duckKs("a", """SELECT CAST(source AS VARCHAR) AS g,
              CAST(round(n_chars * 1.0) AS BIGINT) AS v
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL""")},
      ${duckKs("b", """SELECT CAST(event_type AS VARCHAR) AS g,
              CAST(round(value * 10.0) AS BIGINT) AS v
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL""")},
      p AS (SELECT 'doclen:' || grp AS k, p_micro FROM aks
            UNION ALL
            SELECT 'evval:' || grp AS k, p_micro FROM bks),
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
          AS p_adj_micro,
        CAST(min(v) OVER (ORDER BY rn DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          <= 50000 AS sig
      FROM v""")),

    // ---- CCNet line-level boilerplate removal ----------------------------
    // corpus-frequent lines (cookie banner df = N, per-source template
    // df = source size) are dropped from every document; the oracle pins
    // the REASSEMBLED text via md5, not just counts. maxLineDf = 30:
    // at sf0.01 only the global banner breaches; at sf0.1 the source
    // templates (df 250) breach too — the threshold semantics get
    // exercised both ways across the verify scales.
    Q("text_line_dedup", (s, d) => {
      val docs = Tables.ts(s, d, "documents")
        .withColumn("aug", expr(lineAugSpark))
      TextAnalysis.lineDedup(docs, "doc_id", "aug", maxLineDf = 30L)
    }, Some(s"""
      WITH aug AS (SELECT doc_id, $lineAugDuck AS t FROM documents),
      lsx AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug),
      lines AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
              ls[CAST(i AS INT)] AS ln
            FROM lsx, unnest(range(1, len(ls) + 1)) AS t(i)),
      dfq AS (SELECT md5(ln) AS h, count(DISTINCT doc_id) AS ldf
            FROM lines GROUP BY 1),
      j AS (SELECT l.doc_id, l.pos, l.ln, d.ldf
            FROM lines l JOIN dfq d ON md5(l.ln) = d.h)
      SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(coalesce(sum(CASE WHEN ldf <= 30 THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(CASE WHEN ldf <= 30 THEN ln END, chr(10)
          ORDER BY pos), '')) AS kept_hash
      FROM j GROUP BY 1""")),

    // ---- PII scan + redaction --------------------------------------------
    // the privacy-scrub stage: sequential email/IPv4/phone/ID-run regex
    // detection and sentinel redaction, oracle = the identical RE2/Java-
    // agreeing regex chain in DuckDB (counts AND the full redacted text).
    Q("text_pii_scan", (s, d) => {
      val docs = Tables.ts(s, d, "documents")
        .withColumn("aug", expr(piiAug("STRING")))
      Pii.redact(docs, "doc_id", "aug")
    }, Some {
      val nCols = Pii.patterns.zipWithIndex.map { case ((cat, re, _), i) =>
        s"CAST(len(regexp_extract_all(${Pii.duckTextBefore("t", i)}, '$re')) AS BIGINT) AS n_$cat"
      }.mkString(",\n        ")
      s"""
      WITH aug AS (SELECT doc_id, ${piiAug("VARCHAR")} AS t FROM documents)
      SELECT doc_id AS id,
        $nCols,
        ${Pii.duckTextBefore("t", Pii.patterns.size)} AS redacted
      FROM aug"""
    }),

    // ---- per-source PII exposure report -----------------------------------
    // the release-review rollup composed on the scan: per source, doc
    // counts, per-category totals, and the share of docs carrying ANY
    // PII (exact micro ratio).
    Q("text_pii_rate", (s, d) => {
      val docs = Tables.ts(s, d, "documents")
        .withColumn("aug", expr(piiAug("STRING")))
      val red = Pii.redact(docs, "doc_id", "aug")
        .join(t(s, d, "documents")
          .select(col("doc_id").as("id"), col("source")), Seq("id"))
      Pii.exposureReport(red, "source")
    }, Some {
      val nCols = Pii.patterns.zipWithIndex.map { case ((cat, re, _), i) =>
        s"CAST(len(regexp_extract_all(${Pii.duckTextBefore("t", i)}, '$re')) AS BIGINT) AS n_$cat"
      }.mkString(",\n              ")
      val tots = Pii.patterns.map { case (cat, _, _) =>
        s"CAST(sum(n_$cat) AS BIGINT) AS tot_$cat" }.mkString(",\n        ")
      val anyPii = Pii.patterns.map { case (cat, _, _) => s"n_$cat > 0" }
        .mkString(" OR ")
      s"""
      WITH aug AS (SELECT doc_id, source, ${piiAug("VARCHAR")} AS t
            FROM documents),
      sc AS (SELECT doc_id, source,
              $nCols
            FROM aug)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        $tots,
        CAST(coalesce(sum(CASE WHEN $anyPii THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS n_docs_with_pii,
        CAST(round(1e6 * coalesce(sum(CASE WHEN $anyPii THEN 1 ELSE 0 END), 0)
          / count(*)) AS BIGINT) AS pii_rate_micro
      FROM sc GROUP BY 1"""
    }),

    // ---- DoReMi domain-mixture reweighting ---------------------------------
    // the data-mix optimizer: per-source bigram-NLL proxy loss (the
    // text_lm_perplexity model), excess over the corpus mean, 8 rounds of
    // exponentiated-gradient reweighting on the domain table, round-
    // averaged weights as the recipe's readout. Every round micro-rounds
    // the exp factor to an exact long BEFORE the normalizing sum, so the
    // oracle's unrolled CTE chain replays the iteration bit-for-bit.
    Q("text_doremi_mixture", (s, d) => {
      val nll = graft.operators.LangModel.bigramNll(
        Tables.ts(s, d, "documents"), "doc_id", "text", 200)
      val perDoc = nll.select(col("doc").as("doc_id"), col("avg_nll_x1e6"))
        .join(t(s, d, "documents").select(col("doc_id"), col("source")),
          Seq("doc_id"))
      val out = graft.operators.LangModel.doremiMixture(
        perDoc, "source", "avg_nll_x1e6", etaMicro = 200000L, rounds = 8)
      // doremiMixture consumed the proxy loss (its domain collect is the
      // materialization), so the bigramNll cache can be released here
      nll.unpersist(false)
      out
    }, Some {
      val roundCtes = (1 to 8).map { r =>
        s"""u$r AS MATERIALIZED (SELECT grp, n_docs, mean_loss_micro, excess_micro, w_sum,
           |    CAST(round(w * exp(200000 * excess_micro / 1e12)) AS BIGINT) AS u
           |  FROM w${r - 1}),
           |w$r AS MATERIALIZED (SELECT grp, n_docs, mean_loss_micro, excess_micro,
           |    CAST(round(1e6 * u / CAST(sum(u) OVER () AS DOUBLE))
           |      AS BIGINT) AS w,
           |    w_sum + CAST(round(1e6 * u / CAST(sum(u) OVER () AS DOUBLE))
           |      AS BIGINT) AS w_sum
           |  FROM u$r)""".stripMargin
      }.mkString(",\n      ")
      s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      uni AS (SELECT t AS term, count(*) AS cnt
              FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1),
      vocab AS (SELECT term FROM uni ORDER BY cnt DESC, term ASC LIMIT 200),
      vn AS (SELECT count(*) AS v FROM vocab),
      bgr AS (SELECT doc_id,
                unnest(list_zip(list_slice(tk, 1, len(tk)-1),
                                list_slice(tk, 2, len(tk)))) AS z
              FROM toks WHERE len(tk) >= 2),
      bg AS (SELECT doc_id,
               CASE WHEN z[1] IN (SELECT term FROM vocab) THEN z[1] ELSE '<unk>' END AS w1,
               CASE WHEN z[2] IN (SELECT term FROM vocab) THEN z[2] ELSE '<unk>' END AS w2
             FROM bgr),
      db AS (SELECT doc_id, w1, w2, count(*) AS occ FROM bg GROUP BY 1, 2, 3),
      c12 AS (SELECT w1, w2, sum(occ) AS c12 FROM db GROUP BY 1, 2),
      c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      model AS (SELECT c12.w1, c12.w2,
                  CAST(round(-ln((c12.c12 + 1.0) / (c1.c1 + (vn.v + 1.0))) * 1000000.0, 0) AS BIGINT) AS nll_x1e6
                FROM c12 JOIN c1 USING (w1) CROSS JOIN vn),
      pd AS (SELECT db.doc_id,
               CAST(sum(occ * nll_x1e6) // sum(occ) AS BIGINT) AS loss
             FROM db JOIN model USING (w1, w2)
             GROUP BY 1),
      dom0 AS (SELECT d.source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(pd.loss) AS BIGINT) AS s
               FROM pd JOIN documents d USING (doc_id)
               WHERE d.source IS NOT NULL
               GROUP BY 1),
      tot AS (SELECT CAST(sum(s) AS BIGINT) AS st,
                CAST(sum(n_docs) AS BIGINT) AS nt,
                CAST(count(*) AS BIGINT) AS k
              FROM dom0),
      w0 AS MATERIALIZED (SELECT grp, n_docs, s // n_docs AS mean_loss_micro,
               greatest(s // n_docs - st // nt, CAST(0 AS BIGINT))
                 AS excess_micro,
               CAST(round(1e6 / k) AS BIGINT) AS w,
               CAST(0 AS BIGINT) AS w_sum
             FROM dom0 CROSS JOIN tot),
      $roundCtes
      SELECT grp, n_docs, mean_loss_micro, excess_micro,
        w AS w_micro, w_sum // 8 AS w_avg_micro
      FROM w8"""
    }),

    // ---- concat-and-chunk sequence packing ---------------------------------
    // documents laid end to end in id order, cut every 512 tokens: per
    // doc, its bin span and whether it straddles a cut. The global token
    // offset rides the sharded GlobalRank cumsum — the oracle is the
    // plain window formulation.
    Q("text_seq_pack", (s, d) =>
      TextAnalysis.seqPack(t(s, d, "documents"), "doc_id", "text", 512L)
        .withColumnRenamed("id", "doc_id"),
      Some("""
        WITH base AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        c AS (SELECT doc_id, n_tokens,
                sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM base)
        SELECT doc_id, n_tokens,
          CAST((cum - n_tokens) // 512 AS BIGINT) AS start_bin,
          CAST((cum - 1) // 512 AS BIGINT) AS end_bin,
          (cum - 1) // 512 > (cum - n_tokens) // 512 AS crosses
        FROM c""")),

    // ---- packing-efficiency rollup ------------------------------------------
    // the review readout composed on the packing: per training sequence,
    // how many documents touch it and how many start in it (span explode
    // is bounded per doc by n_tokens/512 + 1), plus each bin's doc-count
    // histogram downstream of a corpus where every doc is shorter than
    // one sequence -> n_starts tracks throughput, n_docs tracks mask
    // fragmentation.
    Q("text_pack_bins", (s, d) => {
      val packed = TextAnalysis.seqPack(
        t(s, d, "documents"), "doc_id", "text", 512L)
      packed
        .select(col("id"), col("start_bin"),
          explode(expr("sequence(start_bin, end_bin)")).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("start_bin") === col("bin"), 1L).otherwise(0L))
            .as("n_starts"))
    }, Some("""
        WITH base AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        c AS (SELECT doc_id, n_tokens,
                sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM base),
        spans AS (SELECT doc_id,
                CAST((cum - n_tokens) // 512 AS BIGINT) AS start_bin,
                CAST((cum - 1) // 512 AS BIGINT) AS end_bin
              FROM c),
        ex AS (SELECT doc_id, start_bin,
                unnest(range(start_bin, end_bin + 1)) AS bin
              FROM spans)
        SELECT CAST(bin AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(coalesce(sum(CASE WHEN start_bin = bin THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_starts
        FROM ex GROUP BY 1""")),

    // ---- Lee et al. exact duplicated-substring scrub -----------------------
    // the ExactSubstr REMEDY (cut the duplicated span), where the winnow/
    // minhash families only detect pairs. Constructed duplication: a
    // shared slogan on doc_id % 4 = 0 (cross-doc spans) and a copy of the
    // doc's own first 10 words on doc_id % 7 = 0 (within-doc spans —
    // occurrence-counted, per the paper). Oracle replays gram chains,
    // coverage, and the reassembled scrubbed text via md5.
    Q("dedup_exact_span", (s, d) => {
      val aug = Tables.ts(s, d, "documents").withColumn("aug", expr(
        """concat(text,
          |  CASE WHEN doc_id % 4 = 0
          |    THEN ' please subscribe to our newsletter today for more updates now'
          |    ELSE '' END,
          |  CASE WHEN doc_id % 7 = 0
          |    THEN concat(' ', array_join(slice(split(text, ' '), 1, 10), ' '))
          |    ELSE '' END)""".stripMargin))
      graft.operators.Dedup.exactSpanScrub(aug, "doc_id", "aug", k = 6)
    }, Some {
      val gramChain = (2 to 6).foldLeft("wh[i+1]")((acc, j) =>
        s"($acc * 31 + wh[i+$j]) % ${H.P}")
      s"""
      WITH aug AS (SELECT doc_id, text
            || CASE WHEN doc_id % 4 = 0
                 THEN ' please subscribe to our newsletter today for more updates now'
                 ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                 THEN ' ' || array_to_string(
                   list_slice(string_split(text, ' '), 1, 10), ' ')
                 ELSE '' END AS t
          FROM documents),
      wht AS (SELECT doc_id AS id, ${H.duckWordHashes("t")} AS wh FROM aug),
      g AS (SELECT id, CAST(i AS BIGINT) AS p, $gramChain AS gh
            FROM wht, unnest(range(0, greatest(len(wh) - 5, 0))) AS t(i)),
      dupg AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      cov AS (SELECT DISTINCT g.id, g.p + u.u AS pos
            FROM g JOIN dupg ON g.gh = dupg.gh,
                 unnest(range(0, 6)) AS u(u)),
      ws AS (SELECT doc_id AS id, string_split(t, ' ') AS ws FROM aug),
      wpos AS (SELECT id, CAST(i - 1 AS BIGINT) AS pos,
              ws[CAST(i AS INT)] AS w
            FROM ws, unnest(range(1, len(ws) + 1)) AS t(i)),
      kept AS (SELECT wpos.id, wpos.pos, wpos.w
            FROM wpos LEFT JOIN cov
              ON wpos.id = cov.id AND wpos.pos = cov.pos
            WHERE cov.id IS NULL),
      re AS (SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
              md5(string_agg(w, ' ' ORDER BY pos)) AS sh
            FROM kept GROUP BY 1),
      base AS (SELECT id, CAST(len(ws) AS BIGINT) AS n_tokens FROM ws)
      SELECT base.id, n_tokens,
        n_tokens - coalesce(n_kept, 0) AS n_dup_tokens,
        CAST(round(1e6 * (n_tokens - coalesce(n_kept, 0)) / n_tokens)
          AS BIGINT) AS dup_frac_micro,
        coalesce(sh, md5('')) AS scrubbed_hash
      FROM base LEFT JOIN re ON base.id = re.id"""
    }),

    // ---- Bradley-Terry pairwise strengths ----------------------------------
    // the pairwise-preference leaderboard model (LLM eval arenas): head-
    // to-head matches between event types (consecutive same-user events,
    // higher value wins), 10 Hunter-MM rounds on the bounded k^2 cell
    // table, every term micro-rounded before its sum so the oracle's
    // unrolled CTEs replay the iteration exactly.
    Q("q167_bradley_terry", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("pt", lag(col("event_type"), 1).over(w))
        .withColumn("pv", lag(col("value"), 1).over(w))
        .filter(col("pt").isNotNull && col("pt") =!= col("event_type") &&
          col("value").isNotNull && col("pv").isNotNull &&
          col("value") =!= col("pv"))
        .select(
          when(col("value") > col("pv"), col("event_type"))
            .otherwise(col("pt")).as("winner"),
          when(col("value") > col("pv"), col("pt"))
            .otherwise(col("event_type")).as("loser"))
      Stats.bradleyTerry(pairs, "winner", "loser", rounds = 10)
    }, Some {
      val roundCtes = (1 to 10).map { r =>
        s"""d$r AS MATERIALIZED (SELECT c.i AS item,
           |    CAST(sum(CAST(round(1e12 * c.n / (si.s + sj.s)) AS BIGINT))
           |      AS BIGINT) AS den
           |  FROM cells c JOIN s${r - 1} si ON c.i = si.item
           |               JOIN s${r - 1} sj ON c.j = sj.item
           |  GROUP BY 1),
           |u$r AS MATERIALIZED (SELECT s.item, s.n_wins, s.n_matches,
           |    CASE WHEN den = 0 THEN NULL
           |         ELSE CAST(round(1e12 * s.n_wins / den) AS BIGINT)
           |    END AS u
           |  FROM s${r - 1} s JOIN d$r USING (item)),
           |s$r AS MATERIALIZED (SELECT item, n_wins, n_matches,
           |    CAST(round(k * 1e6 * u / CAST(sum(u) OVER () AS DOUBLE))
           |      AS BIGINT) AS s
           |  FROM u$r CROSS JOIN kk)""".stripMargin
      }.mkString(",\n      ")
      s"""
      WITH seq AS (SELECT user_id, event_type, value,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS pt,
              lag(value) OVER (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS pv
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      mt AS (SELECT CASE WHEN value > pv THEN event_type ELSE pt END AS w,
               CASE WHEN value > pv THEN pt ELSE event_type END AS l
             FROM seq WHERE pt IS NOT NULL AND pt <> event_type
               AND value IS NOT NULL AND pv IS NOT NULL AND value <> pv),
      m1 AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS c FROM mt GROUP BY 1, 2),
      cells AS MATERIALIZED (SELECT i, j, CAST(sum(c) AS BIGINT) AS n FROM (
              SELECT w AS i, l AS j, c FROM m1
              UNION ALL SELECT l AS i, w AS j, c FROM m1)
            GROUP BY 1, 2),
      items AS (SELECT i AS item, CAST(sum(n) AS BIGINT) AS n_matches
            FROM cells GROUP BY 1),
      kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM items),
      wins AS (SELECT items.item,
               CAST(coalesce(ww.nw, 0) AS BIGINT) AS n_wins, n_matches
             FROM items LEFT JOIN (SELECT w AS item, sum(c) AS nw
               FROM m1 GROUP BY 1) ww USING (item)),
      s0 AS MATERIALIZED (SELECT item, n_wins, n_matches,
               CAST(1000000 AS BIGINT) AS s FROM wins),
      $roundCtes
      SELECT item, n_wins, n_matches, s AS s_micro FROM s10"""
    }))
}
