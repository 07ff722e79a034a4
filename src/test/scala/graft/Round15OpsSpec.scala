package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EvalText, UnigramLm}

/** Round-15 operators: hand-computed references for the unigram-LM
  * tokenizer trainer (candidate seeding, Viterbi DP with the encoded-key
  * argmin, hard-EM re-estimation) and the exact-span scrub rollup. The
  * sf-corpus behavior is covered by the oracle rows; these pin the
  * trajectory on inputs small enough to verify by hand. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = UnigramLm.Params(maxWordLen = 6, maxPieceLen = 3,
    maxWords = 10, seedPieces = 40, rounds = 2)

  // ---- unigram-LM training ---------------------------------------------

  test("unigramLm.train: hand-worked 2-round hard-EM on {abab x3, ab x2, cd}") {
    // Seeding (freq-weighted substring occurrences):
    //   a:8 b:8 ab:8 ba:3 aba:3 bab:3 c:1 d:1 cd:1, total 36, k=9.
    // cost0: a/b/ab = round(-1e6 ln(8/36)) = 1504077,
    //        aba/ba/bab = 2484907, c/d/cd = 3583519.
    // Round-1 Viterbi: "abab" -> [ab, ab] (2*1504077 beats aba+b and
    // a+bab at 2484907+1504077); "ab" -> [ab]; "cd" -> [cd].
    // Counts: ab = 3*2 + 2 = 8, cd = 1, tot 9.
    // cost1: ab = round(-1e6 ln(9/18)) = 693147, cd = 2197225,
    //        zero-count = round(-1e6 ln(1/18)) = 2890372.
    // Round 2 reproduces the same paths -> final cnt ab=8, cd=1,
    // logp: ab = round(1e6 ln(9/18)) = -693147, cd = -2197225.
    val docs = Seq("abab ab abab ab abab cd").toDF("text")
    val rows = UnigramLm.train(docs, "text", P)
      .orderBy(desc("cnt")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("ab", 8L, -693147L), ("cd", 1L, -2197225L)))
  }

  test("unigramLm.train: single chars win when the multi piece is rare") {
    // corpus {aa}: candidates a:2, aa:1, total 3.
    // cost0: a = -ln(2/3) -> 405465, aa = -ln(1/3) -> 1098612.
    // Viterbi "aa": a+a = 810930 beats aa = 1098612 -> path [a, a].
    // Counts a=2, tot=2, k=2 -> logp(a) = round(1e6 ln(3/4)) = -287682.
    val docs = Seq("aa").toDF("text")
    val rows = UnigramLm.train(docs, "text", P).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("a", 2L, -287682L)))
  }

  test("unigramLm.train: non-matching corpus degenerates to empty") {
    val docs = Seq("... !!! ???").toDF("text")
    assert(UnigramLm.train(docs, "text", P).collect().isEmpty)
  }

  // ---- fertility readout -----------------------------------------------

  test("unigramLm.fertility: per-source totals, coverage, token counts") {
    // same corpus as the first case, all 3 distinct words trained:
    // occurrences abab x3 (2 tokens each), ab x2 (1), cd x1 (1) -> 9.
    val docs = Seq(("s1", "abab ab abab ab abab cd")).toDF("source", "text")
    val r = UnigramLm.fertility(docs, "text", "source", P).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq === Seq(("s1", 6L, 6L, 9L)))
  }

  test("unigramLm.fertility: words outside the maxWords cap stay uncovered") {
    // maxWords=1 keeps only "aa" (wc ties break word-asc); "bb" counts
    // toward words_total but not coverage or tokens
    val p1 = UnigramLm.Params(maxWordLen = 6, maxPieceLen = 3,
      maxWords = 1, seedPieces = 40, rounds = 2)
    val docs = Seq(("s1", "aa bb")).toDF("source", "text")
    val r = UnigramLm.fertility(docs, "text", "source", p1).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq === Seq(("s1", 2L, 1L, 2L)))
  }

  // ---- exact-span scrub rollup -----------------------------------------

  test("exactSpanReport: per-source token removal, affected and emptied docs") {
    // docs 1, 2 (source s1) share the 6-token prefix "x y z a b c":
    // 4 shared 3-gram occurrences cover positions 0-5 in both -> 6 of 9
    // tokens removed each; doc 3 (s2) has no duplicated span.
    val docs = Seq(
      (1L, "s1", "x y z a b c d e f"),
      (2L, "s1", "x y z a b c q w e"),
      (3L, "s2", "p q r s t u v w j")).toDF("doc_id", "source", "text")
    val rows = Dedup.exactSpanReport(docs, "doc_id", "text", "source", k = 3)
      .orderBy("source").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq ===
      Seq(("s1", 2L, 18L, 12L, 2L, 0L, 666667L),
          ("s2", 1L, 9L, 0L, 0L, 0L, 0L)))
  }

  // ---- BLEU / ROUGE -----------------------------------------------------

  test("corpusBleu: hand-counted clipped n-grams, BP and geometric mean") {
    // cand "a b c d e g" vs ref "a b c d e f g":
    // 1-grams 6/6, 2-grams 4/5 (cat: ab,bc,cd,de,eg; 'eg' missing),
    // 3-grams 3/4, 4-grams 2/3; BP = exp(1 - 7/6)
    val pairs = Seq((1L, "a b c d e g", "a b c d e f g"))
      .toDF("id", "cand", "ref")
    val r = EvalText.corpusBleu(pairs, "id", "cand", "ref").collect()(0)
    assert((r.getAs[Long]("cand_len"), r.getAs[Long]("ref_len")) === (6L, 7L))
    assert((r.getAs[Long]("m1"), r.getAs[Long]("t1")) === (6L, 6L))
    assert((r.getAs[Long]("m2"), r.getAs[Long]("t2")) === (4L, 5L))
    assert((r.getAs[Long]("m3"), r.getAs[Long]("t3")) === (3L, 4L))
    assert((r.getAs[Long]("m4"), r.getAs[Long]("t4")) === (2L, 3L))
    // same left-assoc op order as the generated SQL fragment
    val p = 6.0 / 6 * 4 / 5 * 3 / 4 * 2 / 3
    val expected = math.round(1e6 * math.exp(1.0 - 7.0 / 6)
      * math.pow(p, 1.0 / 4))
    assert(r.getAs[Long]("bleu_micro") === expected)
  }

  test("corpusBleu: corpus pooling clips per pair; zero order zeroes BLEU") {
    // pair 1: cand 'a a' vs ref 'a' -> clipped m1 = min(2,1) = 1, t1 = 2
    // pair 2: cand 'b' vs ref 'b b' -> m1 = 1, t1 = 1
    val pairs = Seq((1L, "a a", "a"), (2L, "b", "b b"))
      .toDF("id", "cand", "ref")
    val r = EvalText.corpusBleu(pairs, "id", "cand", "ref").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert((r.getAs[Long]("m1"), r.getAs[Long]("t1")) === (2L, 3L))
    assert(r.getAs[Long]("m2") === 0L) // 'a a' bigram absent from ref 'a'
    assert(r.getAs[Long]("bleu_micro") === 0L)
  }

  test("rougeRecall: per-doc recall, zero-overlap and empty-reference rows") {
    val pairs = Seq(
      (1L, "a b c d e g", "a b c d e f g"),
      (2L, "p q", "x y"),
      (3L, "x y", "")).toDF("id", "cand", "ref")
    val rows = EvalText.rougeRecall(pairs, "id", "cand", "ref", n = 2)
      .orderBy("id").collect()
    assert(rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("m"),
      r.getAs[Long]("ref_grams"))).toSeq ===
      Seq((1L, 4L, 6L), (2L, 0L, 1L), (3L, 0L, 0L)))
    assert(rows(0).getAs[Long]("rouge_micro") === 666667L)
    assert(rows(1).getAs[Long]("rouge_micro") === 0L)
    assert(rows(2).isNullAt(rows(2).fieldIndex("rouge_micro")))
  }

  test("exactSpanReport: fully duplicated doc counts as scrubbed to nothing") {
    // two identical 3-token docs: the whole text is one duplicated gram
    val docs = Seq(
      (1L, "s1", "a b c"),
      (2L, "s1", "a b c")).toDF("doc_id", "source", "text")
    val r = Dedup.exactSpanReport(docs, "doc_id", "text", "source", k = 3)
      .collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toSeq ===
      Seq(("s1", 2L, 6L, 6L, 2L, 2L, 1000000L)))
  }
}
