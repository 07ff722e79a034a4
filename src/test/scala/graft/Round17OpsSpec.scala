package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bpe, EvalText, Wordpiece}

/** Round-17 operators: hand-counted chrF / chrF++ cases (per-order char
  * and word gram statistics, the β=2 F readout, and the zero guards),
  * and WordPiece training (likelihood-vs-frequency divergence from BPE,
  * `##` continuation convention, longest-match-first segmentation). */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- chrF / chrF++ ----------------------------------------------------

  test("chrF: hand-counted char + word gram statistics and both readouts") {
    // cand "ab cd" vs ref "ab ce" — chars (space removed) "abcd"/"abce":
    //   n=1: m=3 (a,b,c) t=4 r=4;  n=2: m=2 (ab,bc) t=3 r=3
    //   n=3: m=1 (abc) t=2 r=2;    n=4: m=0 t=1 r=1;  n=5,6: t=r=0
    // words: n=1 m=1 (ab) t=2 r=2; n=2 m=0 t=1 r=1
    val pairs = Seq((1L, "ab cd", "ab ce")).toDF("id", "cand", "ref")
    val r = EvalText.chrF(pairs, "id", "cand", "ref").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert((r.getAs[Long]("cm1"), r.getAs[Long]("ct1"),
      r.getAs[Long]("cr1")) === (3L, 4L, 4L))
    assert((r.getAs[Long]("cm2"), r.getAs[Long]("ct2"),
      r.getAs[Long]("cr2")) === (2L, 3L, 3L))
    assert((r.getAs[Long]("cm3"), r.getAs[Long]("ct3"),
      r.getAs[Long]("cr3")) === (1L, 2L, 2L))
    assert((r.getAs[Long]("cm4"), r.getAs[Long]("ct4"),
      r.getAs[Long]("cr4")) === (0L, 1L, 1L))
    assert((r.getAs[Long]("ct5"), r.getAs[Long]("cr5")) === (0L, 0L))
    assert((r.getAs[Long]("ct6"), r.getAs[Long]("cr6")) === (0L, 0L))
    assert((r.getAs[Long]("wm1"), r.getAs[Long]("wt1"),
      r.getAs[Long]("wr1")) === (1L, 2L, 2L))
    assert((r.getAs[Long]("wm2"), r.getAs[Long]("wt2"),
      r.getAs[Long]("wr2")) === (0L, 1L, 1L))
    // symmetric stats => P = R = (3/4 + 2/3 + 1/2)/6 = 23/72, and the
    // β=2 F-mean of equal P,R is P itself: round(1e6 * 23/72) = 319444
    assert(r.getAs[Long]("chrf_micro") === 319444L)
    // chrF++ adds the word terms: P = R = (23/12 + 1/2)/8 = 29/96
    assert(r.getAs[Long]("chrf_pp_micro") === 302083L)
  }

  test("chrF: asymmetric P/R weights recall 4x (beta = 2)") {
    // cand "ab" vs ref "abc" — chars "ab"/"abc":
    //   n=1: m=2 t=2 r=3;  n=2: m=1 t=1 r=2;  n=3: t=0 (P term 0) r=1
    // P = (1 + 1)/6 = 1/3, R = (2/3 + 1/2)/6 = 7/36
    // F2 = 5*P*R / (4P + R) = (35/108)/(55/36) = 0.2121...
    val pairs = Seq((1L, "ab", "abc")).toDF("id", "cand", "ref")
    val r = EvalText.chrF(pairs, "id", "cand", "ref").collect()(0)
    assert((r.getAs[Long]("cm1"), r.getAs[Long]("ct1"),
      r.getAs[Long]("cr1")) === (2L, 2L, 3L))
    assert((r.getAs[Long]("cm2"), r.getAs[Long]("ct2"),
      r.getAs[Long]("cr2")) === (1L, 1L, 2L))
    assert((r.getAs[Long]("ct3"), r.getAs[Long]("cr3")) === (0L, 1L))
    assert(r.getAs[Long]("chrf_micro") === 212121L)
  }

  test("chrF: zero overlap reads 0 through the guard (no NaN)") {
    val pairs = Seq((1L, "x", "y")).toDF("id", "cand", "ref")
    val r = EvalText.chrF(pairs, "id", "cand", "ref").collect()(0)
    assert(r.getAs[Long]("chrf_micro") === 0L)
    assert(r.getAs[Long]("chrf_pp_micro") === 0L)
  }

  test("chrF: corpus pooling sums statistics across pairs before the ratio") {
    // two pairs, chars: (1) "aa"/"aa" perfect, (2) "bb"/"cc" disjoint.
    //   n=1: m=2 t=4 r=4 (pooled) — NOT the mean of per-pair scores
    val pairs = Seq((1L, "aa", "aa"), (2L, "bb", "cc"))
      .toDF("id", "cand", "ref")
    val r = EvalText.chrF(pairs, "id", "cand", "ref").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert((r.getAs[Long]("cm1"), r.getAs[Long]("ct1"),
      r.getAs[Long]("cr1")) === (2L, 4L, 4L))
    // n=2: cand grams aa,bb; ref aa,cc -> m=1 of t=2
    assert((r.getAs[Long]("cm2"), r.getAs[Long]("ct2"),
      r.getAs[Long]("cr2")) === (1L, 2L, 2L))
  }

  // ---- WordPiece --------------------------------------------------------

  test("wordpiece: likelihood score diverges from BPE frequency on a hand case") {
    // "ab"x10 "ac"x10 "ad"x10 "xy"x3: units a:30 ##b/##c/##d:10 x:3 ##y:3.
    // BPE's argmax is the FREQUENT pair (a,b) cnt=10; WordPiece's is the
    // RARE-but-exclusive (x,##y): 3/(3*3)=1/3 beats 10/(30*10)=1/30.
    val text = (List.fill(10)("ab") ++ List.fill(10)("ac") ++
      List.fill(10)("ad") ++ List.fill(3)("xy")).mkString(" ")
    val docs = Seq(Tuple1(text)).toDF("text")
    val wp = Wordpiece.train(docs, "text", merges = 2).orderBy("step").collect()
    assert((wp(0).getAs[String]("lft"), wp(0).getAs[String]("rgt")) ===
      ("x", "##y"))
    assert((wp(0).getAs[Long]("cnt"), wp(0).getAs[Long]("ul"),
      wp(0).getAs[Long]("ur")) === (3L, 3L, 3L))
    assert(wp(0).getAs[Long]("score_pico") === 333333333333L) // 1e12/3
    // round 2: (a,##b) wins the 1/30 three-way tie on rgt asc
    assert((wp(1).getAs[String]("lft"), wp(1).getAs[String]("rgt")) ===
      ("a", "##b"))
    assert(wp(1).getAs[Long]("score_pico") === 33333333333L) // 1e12/30
    val bpe = Bpe.train(docs, "text", merges = 1).collect()
    assert((bpe(0).getAs[String]("lft"), bpe(0).getAs[String]("rgt")) ===
      ("a", "b"))
  }

  test("wordpiece: continuation-pair merge keeps the ## marking") {
    // "abc"x5: units a/##b/##c all 5, pairs (a,##b) and (##b,##c) tie at
    // 5/25 — lft asc picks ##b ('#' < 'a'), merged unit is ##bc; round 2
    // fuses (a,##bc) into the full word
    val docs = Seq(Tuple1(List.fill(5)("abc").mkString(" "))).toDF("text")
    val wp = Wordpiece.train(docs, "text", merges = 2).orderBy("step").collect()
    assert((wp(0).getAs[String]("lft"), wp(0).getAs[String]("rgt")) ===
      ("##b", "##c"))
    assert((wp(1).getAs[String]("lft"), wp(1).getAs[String]("rgt")) ===
      ("a", "##bc"))
    val v = Wordpiece.vocab(docs, "text", merges = 2, topK = 5).collect()
    assert(v.map(_.getAs[String]("token")).toSeq === Seq("abc"))
  }

  test("wordpiece: vocab marks continuations distinctly from initials") {
    // "ab ba"x4: units a,##b,b,##a each 4 — initial 'a' and continuation
    // '##a' are separate vocabulary entries
    val docs = Seq(Tuple1(List.fill(4)("ab ba").mkString(" "))).toDF("text")
    val v = Wordpiece.vocab(docs, "text", merges = 0, topK = 10)
      .collect().map(_.getAs[String]("token")).toSet
    assert(v === Set("a", "b", "##a", "##b"))
  }

  test("segmentWord: greedy longest-match-first with ## continuation") {
    val units = Set("ab", "abc", "a", "##b", "##cd", "##c", "##d")
    // longest match at pos 0 is "abc", then "##d"
    assert(Wordpiece.segmentWord("abcd", units) ===
      Some(Seq("abc", "##d")))
    // after "ab", remainder needs continuation units
    assert(Wordpiece.segmentWord("abcd", Set("ab", "##cd")) ===
      Some(Seq("ab", "##cd")))
    // no unit covers 'z' -> [UNK]
    assert(Wordpiece.segmentWord("abz", units) === None)
    assert(Wordpiece.segmentWord("a", units) === Some(Seq("a")))
  }

  // ---- TER (word-level edit distance) -----------------------------------

  test("ter: hand cases through the operator") {
    val pairs = Seq(
      (1L, "a b c", "a x c"),      // one substitution
      (2L, "a b c d", "a b c"),    // one deletion from candidate
      (3L, "a c", "a b c"),        // one insertion into candidate
      (4L, "x y z", "a b c"),      // all substitutions
      (5L, "a b", "a b"),          // exact
      (6L, "", "a b"),             // empty candidate: rl edits
      (7L, "a b", "")              // empty reference: cl edits, TER NULL
    ).toDF("id", "cand", "ref")
    val out = EvalText.ter(pairs, "id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(1L) === ((1L, 333333L)))
    assert(out(2L) === ((1L, 333333L)))
    assert(out(3L) === ((1L, 333333L)))
    assert(out(4L) === ((3L, 1000000L)))
    assert(out(5L) === ((0L, 0L)))
    assert(out(6L) === ((2L, 1000000L)))
    assert(out(7L) === ((2L, -1L)))   // NULL ter on empty reference
  }

  test("ter kernel: property check against the classic three-branch DP") {
    import graft.functions.EditDistImpl
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def naive(a: Seq[String], b: Seq[String]): Long = {
      val n = a.length; val m = b.length
      val dp = Array.tabulate(n + 1, m + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to n; j <- 1 to m)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(n)(m).toLong
    }
    def arr(xs: Seq[String]): ArrayData =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    // deterministic pseudo-random token sequences over a narrow vocab
    // (narrow => plenty of matches, the DP's interesting regime)
    val vocab = Vector("a", "b", "c", "d")
    def seqOf(seed: Int): Seq[String] = {
      val len = (seed * 2654435761L >>> 28).toInt % 9
      (0 until len).map(i =>
        vocab((((seed * 31 + i) * 2654435761L) >>> 30).toInt % 4))
    }
    for (s <- 0 until 60) {
      val (a, b) = (seqOf(s), seqOf(s + 1000))
      assert(EditDistImpl.dist(arr(a), arr(b)) === naive(a, b),
        s"mismatch on $a vs $b")
    }
  }
}
