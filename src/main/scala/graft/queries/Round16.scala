package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.AudioNative
import graft.operators.{Chunking, CompandedWav, Dedup, EvalText, UnigramLm}

/** Round-16 queries:
  *  - text_rouge_l: per-document ROUGE-L over the same lossy-paraphrase
  *    pairs as text_rouge — LCS via the native [[graft.functions.LcsLength]]
  *    kernel; the oracle replays the DP as a recursive CTE using the
  *    last-match identity ([[EvalText.rougeLOracleSql]]);
  *  - text_bleu_smooth: Chen–Cherry method-2 smoothed corpus BLEU-4 — a
  *    pure readout over the exact integer match/total columns text_bleu
  *    already emits, same CTE chain on both engines.
  */
object Round16 {

  /** The pruned-tokenizer params: same corpus knobs as Round15's UP but
    * with the pruning schedule on — the inventory shrinks from
    * seedPieces (512) to 128 after round 1 by EM-loss contribution, and
    * round 2 re-estimates on the shrunk inventory. */
  private val UPP = UnigramLm.Params(pruneTo = 128)

  /** G.711 payload byte formulas, one per class (0-1 µ-law, 2-3 A-law):
    * a full-table sweep and a pseudo-random walk per companding law, so
    * the oracle's closed-form expansion checks every segment of both
    * tables. Scala and SQL compute the SAME byte. */
  private def g711Byte(cls: Int, i: Long): Int = cls match {
    case 0 => (i % 256L).toInt
    case 1 => ((i * 2654435761L) % 256L).toInt
    case 2 => (i % 256L).toInt
    case _ => ((i * 48271L) % 256L).toInt
  }
  private val g711ByteSql =
    """CASE cls WHEN 0 THEN i % 256 WHEN 1 THEN (i * 2654435761) % 256
      |     WHEN 2 THEN i % 256 ELSE (i * 48271) % 256 END""".stripMargin

  /** IMA-ADPCM nibble formulas per class: silence drift, up/down
    * alternation, full nibble sweep, pseudo-random — plus per-class
    * initial (predictor, step index). */
  private[queries] def imaNibble(cls: Int, i: Long): Int = cls match {
    case 0 => 0
    case 1 => if (i % 2L == 0L) 4 else 12
    case 2 => (i % 16L).toInt
    case _ => ((i * 2654435761L) % 16L).toInt
  }
  private[queries] val imaNibbleSql =
    """CASE cls WHEN 0 THEN 0
      |     WHEN 1 THEN CASE WHEN j % 2 = 0 THEN 4 ELSE 12 END
      |     WHEN 2 THEN j % 16 ELSE (j * 2654435761) % 16 END""".stripMargin
  private[queries] val ImaN = 1200

  /** µ-law/A-law expansion, closed form over byte `b` (the Sun g711.c
    * arithmetic the Scala tables implement — any table drift breaks the
    * hash). */
  private val g711ExpandSql =
    """CASE WHEN cls < 2 THEN
      |  CASE WHEN (255 - b) >= 128
      |    THEN 132 - ((((255 - b) % 16) * 8 + 132)
      |                * (1 << (((255 - b) // 16) % 8)))
      |    ELSE ((((255 - b) % 16) * 8 + 132)
      |          * (1 << (((255 - b) // 16) % 8))) - 132 END
      |ELSE
      |  CASE WHEN xor(b, 85) >= 128 THEN
      |    CASE WHEN ((xor(b, 85)) // 16) % 8 = 0
      |           THEN (xor(b, 85) % 16) * 16 + 8
      |         WHEN ((xor(b, 85)) // 16) % 8 = 1
      |           THEN (xor(b, 85) % 16) * 16 + 264
      |         ELSE ((xor(b, 85) % 16) * 16 + 264)
      |              * (1 << ((((xor(b, 85)) // 16) % 8) - 1)) END
      |  ELSE -(
      |    CASE WHEN ((xor(b, 85)) // 16) % 8 = 0
      |           THEN (xor(b, 85) % 16) * 16 + 8
      |         WHEN ((xor(b, 85)) // 16) % 8 = 1
      |           THEN (xor(b, 85) % 16) * 16 + 264
      |         ELSE ((xor(b, 85) % 16) * 16 + 264)
      |              * (1 << ((((xor(b, 85)) // 16) % 8) - 1)) END)
      |  END
      |END""".stripMargin

  /** The eight-stat SQL readout over a per-(cls, position) sample table
    * `sl(cls, i, m, pm)` joined back to docs — shared by both new audio
    * queries (the mm_flac_stats shape). */
  private[queries] def audioStatsReadout(docFilter: String): String =
    s"""st AS (SELECT cls,
       |        CAST(count(*) AS BIGINT) AS n_frames,
       |        CAST(1 AS BIGINT) AS channels,
       |        CAST(sum(abs(m)) AS BIGINT) AS sum_abs,
       |        CAST(sum(m * m) AS BIGINT) AS sum_sq,
       |        CAST(max(abs(m)) AS BIGINT) AS max_abs,
       |        CAST(sum(CASE WHEN (m > 0 AND pm < 0) OR (m < 0 AND pm > 0)
       |          THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       |        CAST(sum(CASE WHEN abs(m) < 328 THEN 1 ELSE 0 END)
       |          AS BIGINT) AS silence_frames,
       |        CAST(sum(CASE WHEN abs(m) >= 30000 THEN 1 ELSE 0 END)
       |          AS BIGINT) AS clip_frames
       |      FROM sl GROUP BY 1),
       |d AS (SELECT doc_id, doc_id % 4 AS cls FROM documents
       |      WHERE $docFilter)
       |SELECT doc_id, n_frames, channels, sum_abs, sum_sq, max_abs,
       |       zero_crossings, silence_frames, clip_frames
       |FROM d JOIN st USING (cls)""".stripMargin

  /** Spark side shared by the audio-door queries: payload per class by
    * doc_id, the native stats expression, eight named columns. */
  private[queries] def audioStatsQuery(s: org.apache.spark.sql.SparkSession,
      d: String, payloads: Seq[Array[Byte]]) =
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

  /** Shared passage appended to every third document for the CDC query:
    * long enough (≥ 2×maxLen chars) that gear chunking must emit at
    * least one full chunk inside it regardless of where the preceding
    * text leaves the hash state — the resynchronization property under
    * test. Shared verbatim with the oracle CTE. */
  private val CdcSlogan =
    "content defined chunking resynchronizes after any local edit so " +
      "shared passages collapse to identical chunks wherever they sit " +
      "in each document"

  /** 11-token canary planted in the benchmark set and in every 9th
    * corpus doc for the decontamination query — long enough to contain
    * four 8-grams. Shared verbatim with both oracle CTEs. */
  private val DecontCanary =
    "canary alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  val defs: Seq[Q] = Seq(

    // ---- content-defined chunking dedup --------------------------------
    // which documents carry corpus-duplicated passages, and how much of
    // their content is boilerplate? (the storage-dedup primitive: gear
    // CDC -> chunk-grain duplicate count -> doc-grain scorecard; the
    // oracle replays the 64-bit gear walk per character as a recursive
    // CTE, so the constant, mask, reset, and min/max disciplines are all
    // hash-checked)
    Q("dedup_cdc_chunks", (s, d) => {
      val aug = Tables.ts(s, d, "documents")
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" " + CdcSlogan))
            .otherwise(lit(""))).as("aug"))
      Chunking.cdcDedupReport(aug, "doc_id", "aug")
    }, Some(Chunking.cdcOracleSql(
      s"""cdcdocs AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |         text || CASE WHEN doc_id % 3 = 0 THEN ' $CdcSlogan'
         |                      ELSE '' END AS text
         |  FROM documents)""".stripMargin))),

    // ---- benchmark decontamination --------------------------------------
    // which training docs leak benchmark content? (the GPT-3/Llama
    // train-test-overlap step): every 50th doc plays the benchmark set,
    // an 11-token canary is planted in the benchmark AND in every 9th
    // remaining doc, and any doc sharing a verbatim 8-gram with the
    // benchmark flags contaminated — natural overlap counts too
    Q("dedup_decontaminate", (s, d) => {
      val canary = DecontCanary
      val all = Tables.ts(s, d, "documents")
      val bench = all.filter(col("doc_id") % 50 === 0)
        .select(concat(col("text"), lit(" " + canary)).as("btext"))
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 9 === 0, lit(" " + canary))
            .otherwise(lit(""))).as("ctext"))
      Dedup.decontaminate(corpus, "doc_id", "ctext", bench, "btext", k = 8)
    }, Some(Dedup.decontaminateOracleSql(
      s"""dcorpus AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |         text || CASE WHEN doc_id % 9 = 0 THEN ' $DecontCanary'
         |                      ELSE '' END AS text
         |  FROM documents WHERE doc_id % 50 <> 0)""".stripMargin,
      s"""dbench AS MATERIALIZED (
         |  SELECT text || ' $DecontCanary' AS text
         |  FROM documents WHERE doc_id % 50 = 0)""".stripMargin,
      k = 8))),

    // ---- unigram-LM with the SentencePiece pruning schedule ------------
    // which pieces survive when the inventory must shrink 4x, and how do
    // their probabilities shift once the freed mass re-distributes?
    Q("text_unigram_pruned", (s, d) =>
      UnigramLm.train(Tables.ts(s, d, "documents"), "text", UPP),
      Some(UnigramLm.trainOracleSql(UPP))),

    // ---- ROUGE-L ------------------------------------------------------
    // which documents lose the most longest-common-subsequence structure
    // to the paraphrase? (the LCS variant every summarization eval
    // reports next to ROUGE-N)
    Q("text_rouge_l", (s, d) =>
      EvalText.rougeL(Round15.evalPairs(s, d), "id", "cand", "ref"),
      Some(EvalText.rougeLOracleSql(Round15.evalPairsCte))),

    // ---- smoothed corpus BLEU ------------------------------------------
    // the smoothed convention the unsmoothed text_bleu documented as "a
    // readout away" — now a first-class mirrored readout
    Q("text_bleu_smooth", (s, d) =>
      EvalText.smoothedBleu(Round15.evalPairs(s, d), "id", "cand", "ref"),
      Some(EvalText.smoothedBleuOracleSql(Round15.evalPairsCte))),

    // ---- G.711 companded audio through the stats gate -------------------
    // µ-law and A-law WAVs (format tags 7/6) decode through the
    // CompandedWav door and re-enter as PCM16; payloads sweep every byte
    // of both companding tables, and the oracle recomputes the Sun
    // g711.c expansion CLOSED-FORM per byte — one wrong table entry or
    // sign flips the hash.
    Q("mm_g711_stats", (s, d) => {
      val payloads = (0 until 4).map(k => CompandedWav.g711WavFromBytes(
        Array.tabulate(1200)(i => g711Byte(k, i.toLong).toByte),
        1, 8000, aLaw = k >= 2))
      audioStatsQuery(s, d, payloads)
    }, Some(s"""
      WITH cl AS (SELECT DISTINCT doc_id % 4 AS cls FROM documents
                  WHERE doc_id < 400),
      bt AS (SELECT cl.cls, CAST(t.range AS BIGINT) AS i,
               CAST($g711ByteSql AS BIGINT) AS b
             FROM cl CROSS JOIN range(1200) t),
      sm AS (SELECT cls, i, $g711ExpandSql AS m FROM bt),
      sl AS (SELECT cls, i, m,
               lag(m) OVER (PARTITION BY cls ORDER BY i) AS pm FROM sm),
      ${audioStatsReadout("doc_id < 400")}""")),

    // ---- IMA ADPCM through the stats gate --------------------------------
    // block-compressed 4-bit ADPCM (format tag 17): the oracle replays
    // the step-table state machine (diff expansion, both clamps, index
    // walk) as a recursive CTE from the same nibble formulas — the
    // strongest kind of codec oracle, since every one of the 1200 state
    // transitions per class must match the Scala decoder exactly.
    Q("mm_adpcm_stats", (s, d) => {
      val payloads = (0 until 4).map(k => CompandedWav.imaWavFromNibbles(
        k * 1000, k * 8,
        Array.tabulate(ImaN)(i => imaNibble(k, i.toLong)), 8000))
      audioStatsQuery(s, d, payloads)
    }, Some(s"""
      WITH RECURSIVE stp(sidx, step) AS (VALUES
        ${CompandedWav.StepTable.zipWithIndex
          .map { case (st, ix) => s"($ix,$st)" }.mkString(",")}),
      cl AS (SELECT DISTINCT doc_id % 4 AS cls FROM documents
             WHERE doc_id < 400),
      dec AS (
        SELECT cls, CAST(0 AS BIGINT) AS j,
               CAST(cls * 1000 AS BIGINT) AS pred,
               CAST(cls * 8 AS BIGINT) AS sidx
        FROM cl
        UNION ALL
        SELECT cls, j + 1,
          CASE WHEN nib >= 8 THEN greatest(-32768, pred - diff)
               ELSE least(32767, pred + diff) END,
          least(88, greatest(0, sidx
            + CASE WHEN nib % 8 >= 4 THEN (nib % 8 - 3) * 2 ELSE -1 END))
        FROM (
          SELECT cls, j, pred, sidx, nib,
                 (step // 8)
                 + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
                 + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
                 + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END AS diff
          FROM (
            SELECT d0.cls, d0.j, d0.pred, d0.sidx, s.step,
                   CAST($imaNibbleSql AS BIGINT) AS nib
            FROM dec d0 JOIN stp s ON s.sidx = d0.sidx
            WHERE d0.j < $ImaN) a) b),
      sm AS (SELECT cls, j AS i, pred AS m FROM dec),
      sl AS (SELECT cls, i, m,
               lag(m) OVER (PARTITION BY cls ORDER BY i) AS pm FROM sm),
      ${audioStatsReadout("doc_id < 400")}"""))
  )
}
