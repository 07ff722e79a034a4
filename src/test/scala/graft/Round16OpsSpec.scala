package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EvalText
import graft.functions.LcsNative

/** Round-16 operators: hand cases for the LCS kernel and ROUGE-L, a
  * property check of the last-match identity the DuckDB oracle relies on
  * against the classic three-branch DP, and the smoothed-BLEU readout. */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- LCS kernel --------------------------------------------------------

  private def lcsOf(a: Seq[String], b: Seq[String]): Long = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(LcsNative.lcsLength(col("a"), col("b"))).head().getLong(0)
  }

  test("lcsLength: hand cases") {
    // classic: LCS("ABCBDAB", "BDCABA") = 4 (BCAB / BDAB / BCBA)
    assert(lcsOf("A B C B D A B".split(" "), "B D C A B A".split(" ")) === 4L)
    assert(lcsOf(Seq("x", "y", "z"), Seq("x", "y", "z")) === 3L)
    assert(lcsOf(Seq("x", "y", "z"), Seq("p", "q")) === 0L)
    assert(lcsOf(Seq.empty, Seq("a")) === 0L)
    assert(lcsOf(Seq("a"), Seq.empty) === 0L)
    // repeated tokens: LCS(aab, abaa) = 3? c=[a,a,b], r=[a,b,a,a]:
    // "a a" (2) vs "a b" -> a,b = 2... chains: a(1),a(3)->no b after; a(1),b(2)
    // then nothing; a(1),a(3),a(4) length 3 needs c to have 3 a's (only 2).
    // c=[a,a,b]: match a->r1, a->r3, b->none after r3; or a->r1,b->r2 then
    // nothing. Max = 2.
    assert(lcsOf(Seq("a", "a", "b"), Seq("a", "b", "a", "a")) === 2L)
  }

  test("lcsLength kernel matches the classic DP on random token arrays " +
      "(the last-match identity the DuckDB oracle replays)") {
    def classic(c: Seq[String], r: Seq[String]): Int = {
      val m = r.length
      var prev = new Array[Int](m + 1)
      var cur = new Array[Int](m + 1)
      for (ci <- c) {
        var j = 1
        while (j <= m) {
          cur(j) = if (ci == r(j - 1)) prev(j - 1) + 1
            else math.max(cur(j - 1), prev(j))
          j += 1
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
      }
      prev(m)
    }
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d", "e")
    val cases = (0 until 200).map { _ =>
      val c = Seq.fill(rnd.nextInt(13))(vocab(rnd.nextInt(5)))
      val r = Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(5)))
      (c, r, classic(c, r).toLong)
    }
    val got = cases.map { case (c, r, _) => (c, r) }.toDF("a", "b")
      .select(LcsNative.lcsLength(col("a"), col("b"))).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((c, r, want), g) =>
      assert(g === want, s"c=$c r=$r")
    }
  }

  // ---- ROUGE-L -----------------------------------------------------------

  test("rougeL: hand case with recall and F1 micro") {
    // cand "the cat sat", ref "the cat sat down": LCS=3, P=1, R=3/4.
    // recall_micro = round(1e6*3/4) = 750000;
    // F1 = 2*1*(0.75)/(1+0.75) = 6/7 -> round(1e6*6/7) = 857143.
    val pairs = Seq((1L, "the cat sat", "the cat sat down"),
      (2L, "", "x y"), // empty candidate: lcs 0, f1 NULL? cand_len=0 -> NULL
      (3L, "a b", "c d")) // no overlap: lcs 0 -> f1 0, recall 0
      .toDF("id", "cand", "ref")
    val rows = EvalText.rougeL(pairs, "id", "cand", "ref")
      .orderBy("id").collect()
    assert(rows(0).getLong(1) === 3L) // lcs
    assert(rows(0).getLong(2) === 3L) // cand_len
    assert(rows(0).getLong(3) === 4L) // ref_len
    assert(rows(0).getLong(4) === 750000L)
    assert(rows(0).getLong(5) === 857143L)
    assert(rows(1).getLong(1) === 0L)
    assert(rows(1).isNullAt(5)) // cand_len = 0 -> F1 NULL
    assert(rows(1).getLong(4) === 0L) // recall 0/2
    assert(rows(2).getLong(4) === 0L)
    assert(rows(2).getLong(5) === 0L)
  }

  // ---- smoothed BLEU -----------------------------------------------------

  test("smoothedBleu: exact unigram precision, add-one higher orders") {
    // cand = ref = "a b c": m_n = t_n = (3,2,1,0); unsmoothed BLEU = 0
    // (t4 = 0), smoothed = BP(1) * (1 * 3/3 * 2/2 * 1/1)^... careful:
    // p1 = 3/3 = 1, p2 = (2+1)/(2+1) = 1, p3 = (1+1)/(1+1) = 1,
    // p4 = (0+1)/(0+1) = 1 -> smooth = 1e6.
    val pairs = Seq((1L, "a b c", "a b c")).toDF("id", "cand", "ref")
    val r = EvalText.smoothedBleu(pairs, "id", "cand", "ref").head()
    val cols = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(cols("bleu_micro")) === 0L)
    assert(r.getLong(cols("bleu_smooth_micro")) === 1000000L)
  }

  test("smoothedBleu: zero unigram matches still zero the smoothed score") {
    val pairs = Seq((1L, "x y", "a b")).toDF("id", "cand", "ref")
    val r = EvalText.smoothedBleu(pairs, "id", "cand", "ref").head()
    val cols = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(cols("bleu_smooth_micro")) === 0L)
  }

  // ---- unigram-LM pruning schedule ---------------------------------------

  test("unigramLm pruning: hand-worked shrink to 5 pieces changes the " +
      "segmentation vs the fixed-inventory run") {
    import graft.operators.UnigramLm
    // Corpus {abab x3, ab x2, cd x1} (Round15OpsSpec's first case).
    // Fixed-inventory result: (ab, 8, -693147), (cd, 1, -2197225).
    // With pruneTo = 5 the prune after round 1 keeps singles {a,b,c,d}
    // plus ONE multi by EM-loss:
    //   loss(ab) = 3·(3988984−3008154) + 2·(3008154−1504077) = 5950644
    //     (abab re-segments as aba+b / a+bab at cost0; ab as a+b),
    //   loss(cd) = 1·(7167038−3583519) = 3583519  ->  ab survives.
    // Round 2 on {a,b,c,d,ab}: cnt1-restricted tot = 8, k = 5, so
    // cost1(ab) = round(-1e6·ln(9/13)) = 367725, zero-count singles
    // 2564949. Paths: abab->[ab,ab], ab->[ab], cd->[c,d].
    // Final: cnt ab=8, c=1, d=1, tot=10, k=5:
    //   logp(ab) = round(1e6·ln(9/15))  = -510826,
    //   logp(c) = logp(d) = round(1e6·ln(2/15)) = -2014903.
    val P = UnigramLm.Params(maxWordLen = 6, maxPieceLen = 3,
      maxWords = 10, seedPieces = 40, rounds = 2, pruneTo = 5)
    val docs = Seq("abab ab abab ab abab cd").toDF("text")
    val rows = UnigramLm.train(docs, "text", P)
      .orderBy(desc("cnt"), asc("piece")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("ab", 8L, -510826L),
      ("c", 1L, -2014903L), ("d", 1L, -2014903L)))
  }

  // ---- content-defined chunking --------------------------------------

  private def gearChunksOf(text: String, maskBits: Int = 5,
      minLen: Int = 16, maxLen: Int = 64): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(graft.functions.GearChunksNative.gearChunks(
        col("t"), maskBits, minLen, maxLen).as("c"))
      .head().getSeq[String](0)
  }

  test("gearChunks: structural invariants (lossless, bounded, deterministic)") {
    val rnd = new scala.util.Random(11)
    val texts = (0 until 30).map(_ =>
      (0 until rnd.nextInt(400)).map(_ => ('a' + rnd.nextInt(27)).toChar)
        .mkString.replace('{', ' '))
    texts.foreach { t =>
      val cs = gearChunksOf(t)
      assert(cs.mkString === t, "chunks must concatenate to the input")
      // every chunk except possibly the last obeys [minLen, maxLen]
      cs.dropRight(1).foreach(c =>
        assert(c.length >= 16 && c.length <= 64, s"len ${c.length}"))
      if (cs.nonEmpty) assert(cs.last.length <= 64)
      assert(gearChunksOf(t) === cs, "deterministic")
    }
    assert(gearChunksOf("") === Seq.empty)
    assert(gearChunksOf("short") === Seq("short")) // below minLen: one tail
  }

  test("gearChunks: shared suffixes resynchronize to shared chunks") {
    val shared = "content defined chunking resynchronizes after any " +
      "local edit so shared passages collapse to identical chunks " +
      "wherever they sit in each document"
    val a = gearChunksOf("first prefix of one shape " + shared)
    val b = gearChunksOf("a completely different and longer preamble here " +
      shared)
    val common = a.toSet.intersect(b.toSet)
    assert(common.nonEmpty,
      "CDC must emit at least one identical chunk from the shared passage")
    // and the shared chunks actually come from the shared text
    common.foreach(c => assert(shared.contains(c)))
  }

  test("cdcDedupReport: duplicated passage rolls up per document") {
    import graft.operators.Chunking
    // NOTE: the shared tail must be VARIED text — a low-entropy run
    // (e.g. "xxx…yyy…") can avoid every content boundary, forcing
    // position-dependent maxLen cuts that never resynchronize (real CDC
    // behavior, pinned here by using natural text instead)
    val shared = "content defined chunking resynchronizes after any " +
      "local edit so shared passages collapse to identical chunks " +
      "wherever they sit in each document"
    val docs = Seq(
      (1L, "unique text one " + shared),
      (2L, "another beginning entirely " + shared),
      (3L, "no duplication in this one at all, just its own words"))
      .toDF("id", "text")
    val rows = Chunking.cdcDedupReport(docs, "id", "text")
      .orderBy("id").collect()
    // docs 1 and 2 share chunks from the shared tail; doc 3 shares none
    assert(rows(0).getLong(3) > 0L, "doc 1 dup_chars")
    assert(rows(1).getLong(3) > 0L, "doc 2 dup_chars")
    assert(rows(2).getLong(3) === 0L, "doc 3 dup_chars")
    // chars_total = full text length (chunking is lossless)
    assert(rows(2).getLong(2) ===
      "no duplication in this one at all, just its own words".length.toLong)
  }

  // ---- benchmark decontamination ---------------------------------------

  test("decontaminate: hand-counted gram overlap against a benchmark set") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens -> 7 4-grams, 3 shared
      (2L, "totally different words here nothing shared at all ok"),
      (3L, "x y")) // below k -> no grams, clean
      .toDF("id", "text")
    val bench = Seq(Tuple1("c d e f g h")).toDF("btext") // 3 4-grams
    val rows = Dedup.decontaminate(corpus, "id", "text", bench, "btext",
      k = 4).orderBy("id").collect()
    assert(rows(0).getLong(1) === 7L) // grams_total
    assert(rows(0).getLong(2) === 3L) // grams_matched
    assert(rows(0).getLong(3) === 1L) // contaminated
    assert(rows(1).getLong(1) === 6L)
    assert(rows(1).getLong(2) === 0L)
    assert(rows(1).getLong(3) === 0L)
    assert(rows(2).getLong(1) === 0L)
    assert(rows(2).getLong(3) === 0L)
  }

  test("decontaminate: repeated gram within one doc counts once") {
    import graft.operators.Dedup
    val corpus = Seq((1L, "p q r s p q r s")).toDF("id", "text")
    val bench = Seq(Tuple1("p q r s")).toDF("btext")
    val r = Dedup.decontaminate(corpus, "id", "text", bench, "btext", k = 4)
      .head()
    // 5 gram positions but "p q r s" occurs twice -> 4 DISTINCT grams
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 1L)
  }

  test("unigramLm pruning: pruneTo >= inventory size is a no-op") {
    import graft.operators.UnigramLm
    val base = UnigramLm.Params(maxWordLen = 6, maxPieceLen = 3,
      maxWords = 10, seedPieces = 40, rounds = 2)
    val docs = Seq("abab ab abab ab abab cd").toDF("text")
    val fixed = UnigramLm.train(docs, "text", base).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val noop = UnigramLm.train(docs, "text", base.copy(pruneTo = 1000))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(noop === fixed)
  }
}
