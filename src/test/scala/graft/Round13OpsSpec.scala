package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Stats, TextAnalysis, TimeSeries}

/** Hand-computed cases for the round-13 operators (DuckDB oracles check
  * them end-to-end on the testdata; these pin the arithmetic on inputs
  * small enough to verify by hand). */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Stats.mcnemar -----------------------------------------------------

  test("mcnemar: hand discordant cells b=1 c=3 -> chi2 = 1.0") {
    // rows: (a, b) pairs — one A-only flip, three B-only flips, plus
    // concordant rows that must NOT move the statistic
    val df = Seq(
      (true, false),                                  // b cell
      (false, true), (false, true), (false, true),    // c cells
      (true, true), (false, false), (true, true))
      .toDF("pa", "pb")
    val got = Stats.mcnemar(df, col("pa"), col("pb")).head()
    assert(got.getLong(0) === 7L)
    assert(got.getLong(1) === 1L && got.getLong(2) === 3L)
    // (1-3)^2 / (1+3) = 1.0 -> 10^6 micro
    assert(got.getLong(3) === 1000000L)
  }

  test("mcnemar: NULL predicate folds to false; perfect agreement -> NULL") {
    val withNull = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (null, true), (true, true)).toDF("pa", "pb")
    val r = Stats.mcnemar(withNull, col("pa"), col("pb")).head()
    // null a counts as false -> one c cell, zero b cells
    assert(r.getLong(1) === 0L && r.getLong(2) === 1L)
    assert(r.getLong(3) === math.round(1e6 * 1.0 / 1.0))
    val agree = Seq((true, true), (false, false)).toDF("pa", "pb")
    assert(Stats.mcnemar(agree, col("pa"), col("pb")).head().isNullAt(3))
  }

  // ---- TimeSeries.mannKendall ---------------------------------------------

  /** Events with `cnt(i)` rows on day i (2024-03-01 + i). */
  private def dailyEvents(grp: String, cnts: Seq[Int]) =
    cnts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((grp, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(i).atTime(12, 0))))
    }

  test("mannKendall: S>0, S<0, S=0, and all-tied var18=0 branches") {
    val ev = (dailyEvents("up", Seq(1, 2, 3)) ++
      dailyEvents("down", Seq(3, 2, 1)) ++
      dailyEvents("flat0", Seq(1, 2, 1)) ++
      dailyEvents("tied", Seq(2, 2, 2))).toDF("event_type", "ts")
    val got = TimeSeries.mannKendall(ev, "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    // up: S = +3 over 3 pairs, no ties -> var18 = 3*2*11 = 66,
    // z = (3-1)/sqrt(66/18) = 1.0444659... -> 1044466 micro
    val up = got("up")
    assert(up.getLong(1) === 3L && up.getLong(2) === 3L)
    assert(up.getLong(3) === 3L && up.getLong(4) === 66L)
    assert(up.getLong(5) === math.round(1e6 * 2.0 / math.sqrt(66.0 / 18.0)))
    // down mirrors: S = -3, z negated exactly
    val dn = got("down")
    assert(dn.getLong(3) === -3L && dn.getLong(5) === -up.getLong(5))
    // flat0: pairs (1,2)+1 (1,1)0 (2,1)-1 -> S = 0 with var18 > 0 -> z = 0
    val f = got("flat0")
    assert(f.getLong(3) === 0L && f.getLong(4) > 0L && f.getLong(5) === 0L)
    // tied: all days equal -> tie18 = 66 = n-term -> var18 = 0 -> z NULL
    val t = got("tied")
    assert(t.getLong(3) === 0L && t.getLong(4) === 0L && t.isNullAt(5))
  }

  test("mannKendall: single-day groups are absent") {
    val ev = dailyEvents("solo", Seq(5)).toDF("event_type", "ts")
    assert(TimeSeries.mannKendall(ev, "event_type", "ts").count() === 0L)
  }

  // ---- Stats.cramersV ------------------------------------------------------

  test("cramersV: perfect 2x2 association over observed cells") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "w")
    val r = Stats.cramersV(df, "u", "w").head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    // observed-cell chi2 = 2.0 (the chiSquare contract: zero cells are
    // absent) -> V = sqrt((2.0)/(4*1)) = 0.70710678
    assert(r.getLong(3) === 2000000L)
    assert(r.getLong(4) === math.round(1e6 * math.sqrt(0.5)))
  }

  test("cramersV: single-category margin -> NULL") {
    val df = Seq(("a", "x"), ("a", "y")).toDF("u", "w")
    assert(Stats.cramersV(df, "u", "w").head().isNullAt(4))
  }

  // ---- Stats.cochranQ -------------------------------------------------------

  test("cochranQ: hand 4x3 table") {
    // rows (x0,x1,x2): G=(3,3,2), T=8, sum L^2 = 4+1+4+9 = 18
    // Q = 2*(3*(9+9+4) - 64)/(24 - 18) = 4/6 = 0.666667
    val df = Seq((true, true, false), (true, false, false),
      (false, true, true), (true, true, true)).toDF("a", "b", "c")
    val r = Stats.cochranQ(df, Seq(col("a"), col("b"), col("c"))).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L && r.getLong(2) === 8L)
    assert(r.getLong(3) === math.round(1e6 * 4.0 / 6.0))
  }

  test("cochranQ: all rows concordant -> NULL; NULL folds to false") {
    val allSame = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Stats.cochranQ(allSame, Seq(col("a"), col("b"))).head().isNullAt(3))
    val withNull = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (null, true), (true, true)).toDF("a", "b")
    // null a -> false: rows L = (1, 2); G = (1, 2); T = 3; SL2 = 5
    // Q = 1*(2*(1+4) - 9)/(6 - 5) = 1.0
    assert(Stats.cochranQ(withNull, Seq(col("a"), col("b"))).head()
      .getLong(3) === 1000000L)
  }

  // ---- Stats.kruskalWallis ---------------------------------------------------

  test("kruskalWallis: hand no-tie and tied cases") {
    // [1,2] vs [3,4]: R_a = 3, R_b = 7 -> H = 0.6*29 - 15 = 2.4, no ties
    val noTies = Seq(("a", 1d), ("a", 2d), ("b", 3d), ("b", 4d))
      .toDF("g", "v")
    val r1 = Stats.kruskalWallis(noTies, "g", "v", valScale = 1.0).head()
    assert(r1.getLong(0) === 4L && r1.getLong(1) === 2L)
    assert(r1.getLong(2) === 2400000L && r1.getLong(3) === 2400000L)
    // a=[1,1], b=[1,2]: pooled midranks 2,2,2,4 -> H = 0.6,
    // tie3 = 24, corr = 1 - 24/60 = 0.6 -> H_corr = 1.0
    val tied = Seq(("a", 1d), ("a", 1d), ("b", 1d), ("b", 2d))
      .toDF("g", "v")
    val r2 = Stats.kruskalWallis(tied, "g", "v", valScale = 1.0).head()
    assert(r2.getLong(2) === 600000L && r2.getLong(3) === 1000000L)
    // all values tied: correction denominator 0 -> h_corr NULL
    val allTied = Seq(("a", 1d), ("b", 1d)).toDF("g", "v")
    assert(Stats.kruskalWallis(allTied, "g", "v", valScale = 1.0)
      .head().isNullAt(3))
  }

  test("kruskalWallis: compact-domain guard refuses a wide domain") {
    val wide = (0 until 64).map(i => ("g", i.toDouble)).toDF("g", "v")
    val boom = intercept[IllegalArgumentException] {
      Stats.kruskalWallis(wide, "g", "v", valScale = 1.0,
        maxDistinctValues = 16)
    }
    assert(boom.getMessage.contains("maxDistinctValues"))
  }

  // ---- Stats.friedman ---------------------------------------------------------

  test("friedman: hand 3-block x 3-treatment case") {
    // per-block ranks: b1 1,2,3 / b2 1,2,3 / b3 1,3,2
    // R = (3, 7, 8) -> chi2 = (12/36)*122 - 36 = 4.6667, no ties
    val df = Seq(
      ("b1", "A", 1d), ("b1", "B", 2d), ("b1", "C", 3d),
      ("b2", "A", 2d), ("b2", "B", 4d), ("b2", "C", 6d),
      ("b3", "A", 1d), ("b3", "B", 3d), ("b3", "C", 2d))
      .toDF("b", "t", "v")
    val r = Stats.friedman(df, "b", "t", "v", valScale = 1.0).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === math.round(1e6 * (12.0 * 122 / 36 - 36)))
    assert(r.getLong(3) === r.getLong(2)) // no ties: correction = 1
  }

  test("friedman: design guards fail loud; all-tied -> NULL corrected") {
    val dup = Seq(("b1", "A", 1d), ("b1", "A", 2d), ("b1", "B", 3d))
      .toDF("b", "t", "v")
    assert(intercept[IllegalArgumentException] {
      Stats.friedman(dup, "b", "t", "v", 1.0)
    }.getMessage.contains("duplicate"))
    val incomplete = Seq(("b1", "A", 1d), ("b1", "B", 2d), ("b2", "A", 3d))
      .toDF("b", "t", "v")
    assert(intercept[IllegalArgumentException] {
      Stats.friedman(incomplete, "b", "t", "v", 1.0)
    }.getMessage.contains("incomplete"))
    val allTied = Seq(("b1", "A", 1d), ("b1", "B", 1d),
      ("b2", "A", 2d), ("b2", "B", 2d)).toDF("b", "t", "v")
    assert(Stats.friedman(allTied, "b", "t", "v", 1.0).head().isNullAt(3))
  }

  // ---- Stats.kendallTauB -----------------------------------------------------

  test("kendallTauB: hand concordance, ties, degenerate margin") {
    // x=[1,2,3], y=[1,3,2]: C=2, D=1, no ties -> tau = 1/3
    val plain = Seq((1d, 1d), (2d, 3d), (3d, 2d)).toDF("x", "y")
    val r1 = Stats.kendallTauB(plain, "x", "y", 1.0, 1.0).head()
    assert(r1.getLong(2) === 2L && r1.getLong(3) === 1L)
    assert(r1.getLong(4) === math.round(1e6 / 3.0))
    // x=[1,1,2], y=[1,2,2]: C=1, D=0, n1=n2=1 -> tau_b = 1/sqrt(4) = 0.5
    val tied = Seq((1d, 1d), (1d, 2d), (2d, 2d)).toDF("x", "y")
    assert(Stats.kendallTauB(tied, "x", "y", 1.0, 1.0).head()
      .getLong(4) === 500000L)
    // all x tied: denominator margin zero -> NULL
    val deg = Seq((1d, 1d), (1d, 2d)).toDF("x", "y")
    assert(Stats.kendallTauB(deg, "x", "y", 1.0, 1.0).head().isNullAt(4))
  }

  test("kendallTauB: maxCells guard refuses a wide joint domain") {
    val wide = (0 until 40).map(i => (i.toDouble, (i * 7 % 13).toDouble))
      .toDF("x", "y")
    val boom = intercept[IllegalArgumentException] {
      Stats.kendallTauB(wide, "x", "y", 1.0, 1.0, maxCells = 8)
    }
    assert(boom.getMessage.contains("maxCells"))
  }

  // ---- TimeSeries.pettitt ----------------------------------------------------

  test("pettitt: hand level shift [1,1,5,5]") {
    val ev = dailyEvents("s", Seq(1, 1, 5, 5)).toDF("event_type", "ts")
    val r = TimeSeries.pettitt(ev, "event_type", "ts").head()
    // dr(1) = 3, dr(5) = 7; V = [-2,-2,+2,+2]; U = [-2,-4,-2] (t4 excl)
    // K = 4 at the SECOND day; p = 2*exp(-6*16/80) = 0.6023884...
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === java.time.LocalDate.of(2024, 3, 2).toEpochDay)
    assert(r.getLong(4) === math.round(1e6 * 2.0 * math.exp(-1.2)))
    // single-day group: absent
    val solo = dailyEvents("x", Seq(3)).toDF("event_type", "ts")
    assert(TimeSeries.pettitt(solo, "event_type", "ts").count() === 0L)
  }

  // ---- Stats.ksDriftOneVsRest ---------------------------------------------------

  test("ksDriftOneVsRest: hand disjoint-group D and p") {
    // a=[1,2], b=[3,4]: D = 1.0 for both (disjoint supports), witness at
    // the group's last value; p = 2*exp(-2*(2*2/4)*1) = 2e^-2
    val df = Seq(("a", 1d), ("a", 2d), ("b", 3d), ("b", 4d)).toDF("g", "v")
    val got = Stats.ksDriftOneVsRest(df, "g", "v", valScale = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(1) === 2L)
    assert(got("a").getLong(2) === 1000000L)
    assert(got("a").getLong(3) === 2L) // max first reached at v = 2
    assert(got("a").getLong(4) === math.round(1e6 * 2.0 * math.exp(-2.0)))
    assert(got("b").getLong(2) === 1000000L)
    // identical distributions: D = 0 via the exact numerator, p clamps 1
    val same = Seq(("a", 1d), ("a", 2d), ("b", 1d), ("b", 2d)).toDF("g", "v")
    val s0 = Stats.ksDriftOneVsRest(same, "g", "v", valScale = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(s0("a").getLong(2) === 0L && s0("a").getLong(4) === 1000000L)
    // single group: no rest to compare against -> empty
    val solo = Seq(("a", 1d), ("a", 2d)).toDF("g", "v")
    assert(Stats.ksDriftOneVsRest(solo, "g", "v", 1.0).count() === 0L)
  }

  test("ksDriftOneVsRest: maxCells guard refuses a wide grid") {
    val wide = (0 until 64).map(i => (s"g${i % 8}", i.toDouble)).toDF("g", "v")
    val boom = intercept[IllegalArgumentException] {
      Stats.ksDriftOneVsRest(wide, "g", "v", 1.0, maxCells = 64L)
    }
    assert(boom.getMessage.contains("maxCells"))
  }

  // ---- Stats.bhAdjust / GlobalRank.withCumMin ---------------------------------

  test("bhAdjust: hand suffix-min adjustment") {
    val p = Seq(("t1", 10000L), ("t2", 40000L), ("t3", 45000L))
      .toDF("test", "p_micro")
    val got = Stats.bhAdjust(p, "test", "p_micro")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // v = [3p/1, 3p/2, 3p/3] = [30000, 60000, 45000]
    // suffix min -> [30000, 45000, 45000]
    assert(got("t1") === ((10000L, 1L, 30000L)))
    assert(got("t2") === ((40000L, 2L, 45000L)))
    assert(got("t3") === ((45000L, 3L, 45000L)))
  }

  test("withCumMin (sharded) matches the single-window reference") {
    import graft.operators.GlobalRank
    val rnd = new scala.util.Random(11)
    val rows = (0L until 1000L).map(i => (i, rnd.nextLong() % 100000L))
    val df = rows.toDF("k", "mv")
    // knownCount = -1 forces the sharded path even on a small input
    val got = GlobalRank.withCumMin(df, col("k"), asc = true, col("k"),
        col("mv"), "cm", knownCount = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var run = Long.MaxValue
    rows.sortBy(_._1).foreach { case (k, mv) =>
      run = math.min(run, mv)
      assert(got(k) === run, s"at k=$k")
    }
    // descending direction: suffix mins
    val gotD = GlobalRank.withCumMin(df, col("k"), asc = false, col("k"),
        col("mv"), "cm", knownCount = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    run = Long.MaxValue
    rows.sortBy(-_._1).foreach { case (k, mv) =>
      run = math.min(run, mv)
      assert(gotD(k) === run, s"desc at k=$k")
    }
  }

  // ---- TextAnalysis.docRepetition ----------------------------------------------

  test("docRepetition: hand loop document") {
    val docs = Seq((1L, "a b a b a"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.docRepetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getLong(1) === 5L)                       // n_tokens
    assert(d1.getLong(2) === 500000L)                  // top2: 2/4
    assert(d1.getLong(3) === 1000000L)                 // dup2: 4/4
    assert(d1.getLong(4) === math.round(1e6 * 2.0 / 3.0)) // top3: 2/3
    assert(d1.getLong(5) === math.round(1e6 * 2.0 / 3.0)) // dup3: 2/3
    assert(d1.getLong(6) === 1000000L && d1.getLong(7) === 0L) // 5-gram x1
    assert(d1.isNullAt(8) && d1.isNullAt(9))           // no 10-gram slots
    val d2 = got(2L)
    assert(d2.getLong(1) === 2L)
    assert(d2.getLong(2) === 1000000L && d2.getLong(3) === 0L)
    assert(d2.isNullAt(4))                             // < 3 tokens
  }

  // ---- TextAnalysis winnow index lifecycle ----------------------------------

  test("winnow index: append == rebuild, df cap measured on the index side") {
    // base doc repeated so its fingerprints are shared; the probe shares
    // a >= w+2 run with it -> guaranteed shared fingerprint
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val idx1 = Seq((1L, run + " one two three"),
      (2L, "unrelated words entirely different content here now"))
      .toDF("doc_id", "text")
    val idx2 = Seq((3L, run + " four five six")).toDF("doc_id", "text")
    val probes = Seq((10L, run + " seven eight nine")).toDF("doc_id", "text")
    val dirA = java.nio.file.Files.createTempDirectory("wn-a").toString
    TextAnalysis.buildWinnowIndex(idx1, "doc_id", "text", dirA)
    TextAnalysis.appendWinnowIndex(idx2, "doc_id", "text", dirA)
    val dirB = java.nio.file.Files.createTempDirectory("wn-b").toString
    TextAnalysis.buildWinnowIndex(idx1.unionByName(idx2), "doc_id", "text",
      dirB)
    def q(dir: String, cap: Int = 50) =
      TextAnalysis.queryWinnowIndex(spark, dir, probes, "doc_id", "text",
        w = 4, minShared = 1, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val viaAppend = q(dirA)
    assert(viaAppend === q(dirB), "append must equal one-shot rebuild")
    assert(viaAppend.map(_._2) === Set(1L, 3L)) // both run-sharing docs
    // cap = 1: the shared-run fingerprints have index df = 2 -> dropped
    assert(q(dirA, cap = 1).isEmpty)
  }

  // ---- TimeSeries.siegelSlope ---------------------------------------------

  test("siegelSlope: hand median-of-medians differs from Theil-Sen") {
    // daily counts [1,2,4] on days 0,1,2: pairwise slopes {1, 1.5, 2};
    // per-day medians (lower): day0 [1,1.5]->1, day1 [1,2]->1,
    // day2 [1.5,2]->1.5 -> median of medians = 1.0; Theil-Sen says 1.5
    val ev = dailyEvents("s", Seq(1, 2, 4)).toDF("event_type", "ts")
    val sg = TimeSeries.siegelSlope(ev, "event_type", "ts").head()
    assert(sg.getLong(1) === 3L && sg.getLong(2) === 1000000L)
    assert(TimeSeries.theilSen(ev, "event_type", "ts").head()
      .getLong(3) === 1500000L)
    // span guard mirrors theilSen's
    val far = (dailyEvents("s", Seq(1)) ++ Seq(("s",
      java.sql.Timestamp.valueOf("2035-01-01 00:00:00"))))
      .toDF("event_type", "ts")
    assert(intercept[IllegalArgumentException] {
      TimeSeries.siegelSlope(far, "event_type", "ts", maxSpanDays = 100)
    }.getMessage.contains("maxSpanDays"))
  }

  // ---- Similarity.mutualPairs / mutualTopKIvf ------------------------------

  test("mutualPairs: only reversed pairs survive, pair emitted once") {
    import graft.operators.Similarity
    val tk = Seq(
      (1L, 2L, 0.9), (2L, 1L, 0.9),   // mutual
      (1L, 3L, 0.8),                  // one-directional: 3 never lists 1
      (3L, 4L, 0.7), (4L, 3L, 0.7),   // mutual
      (4L, 1L, 0.6))
      .toDF("query_id", "neighbor_id", "cos")
    val got = Similarity.mutualPairs(tk)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("mutualTopKIvf probing every cell reproduces exact mutualTopK") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    val emb = (0L until 24L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("mnn-ivf-spec").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nCells = 3)
    // nprobe = nCells: every candidate is scored, so the index path must
    // be BIT-identical to the exact N x N mutual join
    val viaIndex = Similarity.mutualTopKIvf(spark, dir, emb, "vec_id",
        "embedding", k = 4, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.mutualTopK(emb, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex === exact)
    assert(viaIndex.nonEmpty)
  }
}
