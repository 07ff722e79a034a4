package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{AudioNative, HashExprs => H}
import graft.operators.{Dedup, EvalText, FlacCodec, UnigramLm}

/** Round-15 queries:
  *  - text_unigram_lm: SentencePiece-style unigram-LM tokenizer training
  *    (hard-EM over a fixed candidate inventory) — the other mainstream
  *    tokenizer family next to text_bpe; the oracle replays the Viterbi
  *    DP as one CTE stage per word position;
  *  - text_unigram_fertility: the corpus fertility/compression readout
  *    under the trained segmentation (text_fertility's shape);
  *  - dedup_exact_span_report: per-source remediation rollup of the
  *    ExactSubstr scrub (tokens removed, docs affected / fully
  *    scrubbed) — the corpus-scale readout of dedup_exact_span;
  *  - mm_flac_stats: REAL FLAC decode ([[FlacCodec]]) through the audio
  *    signal-stats gate — four formula-generated waveform classes are
  *    FLAC-encoded once driver-side (CONSTANT / rice-FIXED / VERBATIM
  *    subframes all exercised) and the oracle recomputes the eight
  *    stats from the generating formulas, so a decode bug anywhere in
  *    the bitstream walk breaks the hash (the SyntheticGif
  *    construct→decode→oracle discipline);
  *  - text_bleu / text_rouge: corpus BLEU-4 and per-document ROUGE-2
  *    recall over a deterministic lossy-paraphrase construction — the
  *    generation-eval pair next to q175's classifier metrics
  *    ([[EvalText]]).
  */
object Round15 {

  /** One Params instance feeds the Spark calls AND the generated oracle
    * SQL (shared-constant discipline). Defaults: maxWordLen 12,
    * maxPieceLen 4, maxWords 4096, seedPieces 512, rounds 2. */
  private val UP = UnigramLm.Params()

  /** The dedup_exact_span constructed-duplication augmentation, kept
    * column-compatible with Round14's entry (shared slogan on
    * doc_id % 4 = 0, self-copied 10-word prefix on doc_id % 7 = 0) plus
    * the `source` column the rollup groups by. */
  private val spanAugSpark =
    """concat(text,
      |  CASE WHEN doc_id % 4 = 0
      |    THEN ' please subscribe to our newsletter today for more updates now'
      |    ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0
      |    THEN concat(' ', array_join(slice(split(text, ' '), 1, 10), ' '))
      |    ELSE '' END)""".stripMargin

  /** DuckDB CTE chain replaying [[Dedup.exactSpanScrub]] on the same
    * augmentation, ending at per-doc `perdoc(id, source, n_tokens,
    * n_dup_tokens)` — the Round14 dedup_exact_span oracle with the
    * source carried through for the rollup. */
  private val spanChainSql: String = {
    val gramChain = (2 to 6).foldLeft("wh[i+1]")((acc, j) =>
      s"($acc * 31 + wh[i+$j]) % ${H.P}")
    s"""WITH aug AS (SELECT doc_id, source, text
       |      || CASE WHEN doc_id % 4 = 0
       |           THEN ' please subscribe to our newsletter today for more updates now'
       |           ELSE '' END
       |      || CASE WHEN doc_id % 7 = 0
       |           THEN ' ' || array_to_string(
       |             list_slice(string_split(text, ' '), 1, 10), ' ')
       |           ELSE '' END AS t
       |    FROM documents),
       |wht AS (SELECT doc_id AS id, ${H.duckWordHashes("t")} AS wh FROM aug),
       |g AS (SELECT id, CAST(i AS BIGINT) AS p, $gramChain AS gh
       |      FROM wht, unnest(range(0, greatest(len(wh) - 5, 0))) AS t(i)),
       |dupg AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT g.id, g.p + u.u AS pos
       |      FROM g JOIN dupg ON g.gh = dupg.gh,
       |           unnest(range(0, 6)) AS u(u)),
       |ws AS (SELECT doc_id AS id, source, string_split(t, ' ') AS ws FROM aug),
       |wpos AS (SELECT id, CAST(i - 1 AS BIGINT) AS pos
       |      FROM ws, unnest(range(1, len(ws) + 1)) AS t(i)),
       |kept AS (SELECT wpos.id, CAST(count(*) AS BIGINT) AS n_kept
       |      FROM wpos LEFT JOIN cov
       |        ON wpos.id = cov.id AND wpos.pos = cov.pos
       |      WHERE cov.id IS NULL GROUP BY 1),
       |perdoc AS (SELECT ws.id, ws.source,
       |        CAST(len(ws.ws) AS BIGINT) AS n_tokens,
       |        CAST(len(ws.ws) AS BIGINT) - coalesce(n_kept, 0)
       |          AS n_dup_tokens
       |      FROM ws LEFT JOIN kept ON ws.id = kept.id)""".stripMargin
  }

  /** Constructed candidate/reference pairs for the generation-eval
    * metrics: reference = the document text, candidate = the text with
    * every 7th word dropped (a deterministic "lossy paraphrase" with
    * known structure). Spark's filter-HOF index is 0-based, DuckDB's
    * list_filter index is 1-based — the two predicates below are the
    * same set. */
  private val evalPairsSpark =
    "array_join(filter(split(text, ' '), (x, i) -> (i + 1) % 7 != 0), ' ')"
  private[queries] val evalPairsCte =
    """pairs AS MATERIALIZED (
      |  SELECT doc_id AS id,
      |         array_to_string(list_filter(string_split(text, ' '),
      |           (x, i) -> i % 7 <> 0), ' ') AS cand,
      |         text AS ref
      |  FROM documents WHERE doc_id < 300)""".stripMargin

  private[queries] def evalPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.ts(s, d, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id").as("id"), expr(evalPairsSpark).as("cand"),
        col("text").as("ref"))

  val defs: Seq[Q] = Seq(

    // ---- unigram-LM tokenizer training -------------------------------
    // which pieces does a unigram LM keep, and at what probability, after
    // hard-EM over the corpus's frequent-word table? (the SentencePiece
    // companion to text_bpe's merge-rule trajectory)
    Q("text_unigram_lm", (s, d) =>
      UnigramLm.train(Tables.ts(s, d, "documents"), "text", UP),
      Some(UnigramLm.trainOracleSql(UP))),

    // how hard does the trained tokenizer fragment each source's text?
    // (fertility = tokens per covered word; coverage = trained-table hit
    // rate — the pair of numbers a tokenizer swap is judged by)
    Q("text_unigram_fertility", (s, d) =>
      UnigramLm.fertility(Tables.ts(s, d, "documents"), "text", "source", UP),
      Some(UnigramLm.fertilityOracleSql(UP))),

    // ---- exact-span scrub remediation report -------------------------
    // what did the ExactSubstr scrub DO to each source? (tokens removed,
    // docs touched, docs emptied — the rollup a 100 TB scrub run reports)
    Q("dedup_exact_span_report", (s, d) => {
      val aug = Tables.ts(s, d, "documents")
        .withColumn("aug", expr(spanAugSpark))
      Dedup.exactSpanReport(aug, "doc_id", "aug", "source", k = 6)
    }, Some(s"""
      $spanChainSql
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
             CAST(sum(n_dup_tokens) AS BIGINT) AS tokens_removed,
             CAST(sum(CASE WHEN n_dup_tokens > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_affected,
             CAST(sum(CASE WHEN n_dup_tokens = n_tokens THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_fully_scrubbed,
             CAST(round(1e6 * CAST(sum(n_dup_tokens) AS DOUBLE)
               / CAST(sum(n_tokens) AS DOUBLE)) AS BIGINT)
               AS removed_frac_micro
      FROM perdoc GROUP BY 1""")),

    // ---- FLAC decode through the audio quality gate ------------------
    // do FLAC shards pass the same loudness/silence/clipping scorecard
    // as WAV shards? Payload classes by doc_id % 4: silence (CONSTANT
    // subframes), flat tone (CONSTANT), clipped triangle (rice-coded
    // FIXED), pseudo-random (VERBATIM) — 1200 mono frames each,
    // block size 256 so every stream is multi-frame with a partial tail.
    Q("mm_flac_stats", (s, d) => {
      val payloads = (0 until 4).map(k =>
        FlacCodec.encodeFlac(flacClassSamples(k), 1, 8000, 256))
      Tables.ts(s, d, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"),
          element_at(array(payloads.map(lit(_)): _*),
            (col("doc_id") % 4 + 1).cast("int")).as("media"))
        .select(col("doc_id"), AudioNative.audioStats(col("media")).as("st"))
        .select(col("doc_id"),
          element_at(col("st"), 1).as("n_frames"),
          element_at(col("st"), 2).as("channels"),
          element_at(col("st"), 3).as("sum_abs"),
          element_at(col("st"), 4).as("sum_sq"),
          element_at(col("st"), 5).as("max_abs"),
          element_at(col("st"), 6).as("zero_crossings"),
          element_at(col("st"), 7).as("silence_frames"),
          element_at(col("st"), 8).as("clip_frames"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id % 4 AS cls FROM documents
                 WHERE doc_id < 400),
      cl AS (SELECT DISTINCT cls FROM d),
      s AS (SELECT cl.cls, t.i AS i,
              CASE cl.cls WHEN 0 THEN 0 WHEN 1 THEN 12000
                WHEN 2 THEN ((t.i % 200) - 100) * 300
                ELSE ((t.i * 2654435761) % 60001) - 30000 END AS m
            FROM cl, range(1200) t(i)),
      sl AS (SELECT cls, i, m,
              lag(m) OVER (PARTITION BY cls ORDER BY i) AS pm FROM s),
      st AS (SELECT cls,
              CAST(count(*) AS BIGINT) AS n_frames,
              CAST(1 AS BIGINT) AS channels,
              CAST(sum(abs(m)) AS BIGINT) AS sum_abs,
              CAST(sum(m * m) AS BIGINT) AS sum_sq,
              CAST(max(abs(m)) AS BIGINT) AS max_abs,
              CAST(sum(CASE WHEN (m > 0 AND pm < 0) OR (m < 0 AND pm > 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
              CAST(sum(CASE WHEN abs(m) < 328 THEN 1 ELSE 0 END)
                AS BIGINT) AS silence_frames,
              CAST(sum(CASE WHEN abs(m) >= 30000 THEN 1 ELSE 0 END)
                AS BIGINT) AS clip_frames
            FROM sl GROUP BY 1)
      SELECT doc_id, n_frames, channels, sum_abs, sum_sq, max_abs,
             zero_crossings, silence_frames, clip_frames
      FROM d JOIN st USING (cls)""")),

    // ---- generation-eval metrics --------------------------------------
    // corpus BLEU-4 of the lossy paraphrase against its source: clipped
    // n-gram precisions + brevity penalty, every count exact until the
    // one closing mirrored double
    Q("text_bleu", (s, d) =>
      EvalText.corpusBleu(evalPairs(s, d), "id", "cand", "ref"),
      Some(EvalText.bleuOracleSql(evalPairsCte))),

    // per-document ROUGE-2 recall of the same pairs — which documents
    // lose the most bigram content to the paraphrase?
    Q("text_rouge", (s, d) =>
      EvalText.rougeRecall(evalPairs(s, d), "id", "cand", "ref", n = 2),
      Some(EvalText.rougeOracleSql(evalPairsCte, n = 2))),

    // ---- FLAC through the perceptual envelope / dedup family ----------
    // the FLAC twin of mm_audio_envelope: the SAME 40-class x 2-gain
    // signal formula, but carried as FLAC bitstreams (Scala-encoded
    // shared constants) instead of SQL-built WAVs — the oracle is the
    // IDENTICAL first-principles envelope recomputation, so the hash
    // proves the lossless decode reproduces the WAV path bit-for-bit.
    Q("mm_flac_envelope", (s, d) =>
      Tables.ts(s, d, "documents")
        .select(col("doc_id"), flacClassMedia.as("media"))
        .select(col("doc_id"), graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("media")))
          .as("fp")),
      Some(s"""
        WITH ${Round14b.duckEnvelopeFpCtes}
        SELECT doc_id, fp FROM efp""")),

    // volume-invariant dedup over FLAC payloads: class at x1 and x16
    // gain collapses to one fingerprint (gain cancels exactly in the
    // integer envelope normalization), grouped class-grain.
    Q("mm_flac_dedup", (s, d) =>
      Tables.ts(s, d, "documents")
        .select(col("doc_id"), flacClassMedia.as("media"))
        .select(col("doc_id"), graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("media")))
          .as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
        .filter(col("n_docs") >= 2L),
      Some(s"""
        WITH ${Round14b.duckEnvelopeFpCtes}
        SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(min(doc_id) AS BIGINT) AS rep_doc
        FROM efp GROUP BY 1 HAVING count(*) >= 2"""))
  )

  /** The 80 distinct FLAC payloads of the audio-class family (40 signal
    * classes × {×1, ×16} gain), encoded ONCE driver-side with the
    * spec-conforming encoder — the same samples Round14b's
    * `wavClassSample` formula generates, so the first-principles
    * envelope oracle is shared verbatim. 63 mono frames at block size
    * 16 → 4 frames per stream incl a 15-sample tail. */
  private lazy val flacClassPayloads: IndexedSeq[Array[Byte]] =
    for (cls <- 0 until 40; gain <- Seq(1, 16)) yield {
      val samples = Array.tabulate(63)(i =>
        ((cls * 53 + i * 997) % 3001 - 1500) * gain)
      FlacCodec.encodeFlac(samples, 1, 8000, 16)
    }

  /** Payload lookup column mirroring `wavClassSample`'s doc_id keying:
    * class = doc_id % 40, ×16 gain when doc_id % 7 = 0. */
  private def flacClassMedia =
    element_at(array(flacClassPayloads.map(lit(_)): _*),
      ((col("doc_id") % 40) * 2
        + when(col("doc_id") % 7 === 0, 1).otherwise(0) + 1).cast("int"))

  /** Formula-generated FLAC payload classes (mono PCM16, 1200 frames) —
    * the ONE definition both the Spark-side encoder input and the
    * oracle's recomputation mirror. Class 2 pins its minimum at exactly
    * -30000 (the clip threshold); class 3's modular walk spans
    * [-30000, 30000]. */
  private def flacClassSamples(cls: Int): Array[Int] =
    Array.tabulate(1200)(i => cls match {
      case 0 => 0
      case 1 => 12000
      case 2 => ((i % 200) - 100) * 300
      case _ => (((i.toLong * 2654435761L) % 60001L) - 30000L).toInt
    })
}
