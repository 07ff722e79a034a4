package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.EvalText

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

  val defs: Seq[Q] = Seq(

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
      Some(EvalText.smoothedBleuOracleSql(Round15.evalPairsCte)))
  )
}
