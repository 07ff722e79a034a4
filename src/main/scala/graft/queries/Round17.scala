package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{CompandedWav, EvalText, Wordpiece}

/** Round-17 queries:
  *  - text_chrf: corpus chrF + chrF++ over the same lossy-paraphrase
  *    pairs as text_bleu — character-grain gram tables through the same
  *    fused single-pass counting and [[EvalText]] oracle machinery,
  *    completing the standard generation-eval triple (BLEU, ROUGE, chrF);
  *  - text_wordpiece: WordPiece tokenizer training — BPE's merge loop
  *    with the likelihood-ratio score and `##` continuation marking,
  *    completing the tokenizer-family triple (BPE, unigram-LM, WordPiece);
  *  - mm_msadpcm_stats: MS-ADPCM (WAV format tag 2) through the
  *    CompandedWav door — the oracle replays the coefficient-pair
  *    predictor recursion per class, so every one of the 1200 state
  *    transitions (truncating division, both clamps, delta adaptation)
  *    must match the Scala decoder exactly.
  */
object Round17 {

  /** Per-class MS-ADPCM block headers: predictor-class index (covering
    * four of the seven coefficient pairs), initial delta, sample1,
    * sample2 — shared with the oracle's `cf` VALUES row by row. */
  private val MsPred = Array(0, 1, 3, 5)
  private val MsDelta0 = Array(16, 32, 50, 100)

  val defs: Seq[Q] = Seq(

    // ---- MS ADPCM through the stats gate --------------------------------
    // the fourth spec-bounded audio door (format tag 2): per-block
    // coefficient-pair linear prediction + delta adaptation; nibble
    // formulas and per-class headers shared with the recursive-CTE
    // oracle, which walks all 1200 (s1, s2, delta) transitions per class
    Q("mm_msadpcm_stats", (s, d) => {
      val payloads = (0 until 4).map(k =>
        CompandedWav.msWavFromNibbles(MsPred(k), MsDelta0(k),
          k * 500, k * 250,
          Array.tabulate(Round16.ImaN)(i => Round16.imaNibble(k, i.toLong)),
          8000))
      Round16.audioStatsQuery(s, d, payloads)
    }, Some(s"""
      WITH RECURSIVE
      adp(anib, ad) AS (VALUES
        ${CompandedWav.MsAdaptTable.zipWithIndex
          .map { case (a, ix) => s"($ix,$a)" }.mkString(",")}),
      cf(cls, c1, c2, d0, s10, s20) AS (VALUES
        ${(0 until 4).map(k => s"($k,${CompandedWav.MsCoefs(MsPred(k))._1}," +
          s"${CompandedWav.MsCoefs(MsPred(k))._2},${MsDelta0(k)}," +
          s"${k * 500},${k * 250})").mkString(",")}),
      cl AS (SELECT DISTINCT doc_id % 4 AS cls FROM documents
             WHERE doc_id < 400),
      dec AS (
        SELECT f.cls, CAST(0 AS BIGINT) AS j,
               CAST(f.s10 AS BIGINT) AS s1, CAST(f.s20 AS BIGINT) AS s2,
               CAST(f.d0 AS BIGINT) AS delta
        FROM cf f JOIN cl USING (cls)
        UNION ALL
        SELECT cls, j + 1,
          least(32767, greatest(-32768, pb + sn * delta)),
          s1,
          least(32767, greatest(16,
            ((ad * delta) - ((ad * delta) % 256)) // 256))
        FROM (
          SELECT cls, j, s1, s2, delta, nib, ad,
                 CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END AS sn,
                 ((s1 * c1 + s2 * c2) - ((s1 * c1 + s2 * c2) % 256))
                   // 256 AS pb
          FROM (
            SELECT cls, j, s1, s2, delta, c1, c2,
                   CAST(${Round16.imaNibbleSql} AS BIGINT) AS nib
            FROM (
              SELECT d0.cls AS cls, d0.j AS j, d0.s1 AS s1, d0.s2 AS s2,
                     d0.delta AS delta, f.c1 AS c1, f.c2 AS c2
              FROM dec d0 JOIN cf f ON f.cls = d0.cls
              WHERE d0.j < ${Round16.ImaN}) z) a
          JOIN adp ON adp.anib = a.nib) b),
      sm AS (
        SELECT cls, CAST(0 AS BIGINT) AS i, s2 AS m FROM dec WHERE j = 0
        UNION ALL
        SELECT cls, j + 1 AS i, s1 AS m FROM dec),
      sl AS (SELECT cls, i, m,
               lag(m) OVER (PARTITION BY cls ORDER BY i) AS pm FROM sm),
      ${Round16.audioStatsReadout("doc_id < 400")}""")),

    // ---- WordPiece tokenizer training ---------------------------------
    // which merges does the LIKELIHOOD score pick, at what pair/unit
    // counts? (diverges from text_bpe's frequency trajectory whenever a
    // rarer pair of rarer symbols beats a frequent pair of ubiquitous
    // ones — the hand case in Round17OpsSpec); the oracle replays all 8
    // rounds' unit counts, pair counts, argmax and fold rewrite
    Q("text_wordpiece", (s, d) =>
      Wordpiece.train(Tables.ts(s, d, "documents"), "text", merges = 8),
      Some(Wordpiece.trainOracleSql(8))),

    // ---- chrF / chrF++ -------------------------------------------------
    // the third metric of the generation-eval triple: character-n-gram
    // F-score (orders 1-6, whitespace removed) averaged with β=2 recall
    // weighting; chrF++ extends the average with word 1/2-grams. Every
    // per-order match/total is an exact corpus integer; both closing
    // doubles share the fragment with the oracle.
    Q("text_chrf", (s, d) =>
      EvalText.chrF(Round15.evalPairs(s, d), "id", "cand", "ref"),
      Some(EvalText.chrfOracleSql(Round15.evalPairsCte)))
  )
}
