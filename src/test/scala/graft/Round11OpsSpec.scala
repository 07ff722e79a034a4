package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{FeatureEng, Similarity, Stats, TextAnalysis,
  TimeSeries}

/** Hand-computed cases for the round-11 operators (the DuckDB oracles
  * check them end-to-end on the testdata; these pin the arithmetic on
  * inputs small enough to verify by hand). */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Stats.spearman ---------------------------------------------------

  test("spearman: monotone +1, inverse -1, hand value with ties") {
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 90.0))
      .toDF("x", "y")
    assert(Stats.spearman(up, "x", "y").head().getDouble(1) === 1.0)
    val down = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0), (4.0, 2.0))
      .toDF("x", "y")
    assert(Stats.spearman(down, "x", "y").head().getDouble(1) === -1.0)
    // ties: x = (1,2,2,3), y = (1,2,3,4): rank_x = (1, 2.5, 2.5, 4),
    // rank_y = 1..4 → Pearson over ranks = 3/√(9.5·... ) hand:
    // a=(1,2.5,2.5,4) b=(1,2,3,4); n=4 Σa=10 Σb=10 Σab=(1+5+7.5+16)=29.5
    // Σa²=(1+6.25+6.25+16)=29.5 Σb²=30; ρ=(4·29.5−100)/√((118−100)(120−100))
    // = 18/√360 = 0.948683
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("x", "y")
    assert(Stats.spearman(tied, "x", "y").head().getDouble(1) === 0.948683)
  }

  // ---- Stats.aucScore ---------------------------------------------------

  test("auc: perfect separation, chance on constant score, hand value") {
    val perfect = Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))
      .toDF("s", "l")
    assert(Stats.aucScore(perfect, col("l"), col("s")).head()
      .getLong(2) === 1000000L)
    val const = Seq((0.5, false), (0.5, true), (0.5, true), (0.5, false))
      .toDF("s", "l")
    assert(Stats.aucScore(const, col("l"), col("s")).head()
      .getLong(2) === 500000L)
    // scores pos {3, 1}, neg {2}: pairs (3>2)=1, (1<2)=0 → AUC = 1/2
    val hand = Seq((3.0, true), (1.0, true), (2.0, false)).toDF("s", "l")
    assert(Stats.aucScore(hand, col("l"), col("s")).head()
      .getLong(2) === 500000L)
  }

  // ---- Stats.gini -------------------------------------------------------

  test("gini: equality 0, concentration (n-1)/n, refuses negatives to NULL") {
    val eq = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("e", "v")
    assert(Stats.gini(eq, "e", "v").head().getLong(2) === 0L)
    // one entity holds everything: G = (n−1)/n = 0.75
    val conc = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L)).toDF("e", "v")
    assert(Stats.gini(conc, "e", "v").head().getLong(2) === 750000L)
    val neg = Seq((1L, -5L), (2L, 10L)).toDF("e", "v")
    assert(Stats.gini(neg, "e", "v").head().isNullAt(2))
  }

  // ---- Stats.cohensKappa ------------------------------------------------

  test("kappa: perfect 1e6, degenerate constant raters NULL, hand value") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    assert(Stats.cohensKappa(perfect, "r1", "r2").head()
      .getLong(3) === 1000000L)
    val const = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    assert(Stats.cohensKappa(const, "r1", "r2").head().isNullAt(3))
    // n=4, agree=3, margins a:(3,2) b:(1,2): spe = 3·2 + 1·2 = 8
    // κ = (4·3 − 8)/(16 − 8) = 0.5
    val hand = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("r1", "r2")
    val row = Stats.cohensKappa(hand, "r1", "r2").head()
    assert(row.getLong(1) === 750000L) // po = 3/4
    assert(row.getLong(2) === 500000L) // pe = 8/16
    assert(row.getLong(3) === 500000L)
  }

  // ---- Stats.benford ----------------------------------------------------

  test("benford: digits bucketed exactly, non-positive rows excluded") {
    val vals = Seq(123L, 19L, 1L, 200L, 9L, 0L, -5L).toDF("v")
    val got = Stats.benford(vals, "v")
      .select("digit", "n_obs").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 1L))
    // expected share of digit 1 = log10(2) ≈ 0.301030
    val e1 = Stats.benford(vals, "v").filter(col("digit") === 1)
      .head().getLong(2)
    assert(e1 === 301030L)
  }

  // ---- Stats.olsFit -----------------------------------------------------

  test("ols: exact line recovered, constant-x group NULL slope") {
    val line = Seq(("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0),
      ("c", 5.0, 1.0), ("c", 5.0, 9.0)).toDF("grp", "x", "y")
    val got = Stats.olsFit(line, "grp", "x", "y", 1.0, 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getDouble(2) === 2.0) // slope
    assert(got("g").getDouble(3) === 1.0) // intercept
    assert(got("c").isNullAt(2) && got("c").isNullAt(3))
  }

  // ---- FeatureEng.jsDivergence -----------------------------------------

  test("jsd: identical slices 0, disjoint slices ln 2") {
    val a = Seq("x", "x", "y").toDF("c")
    assert(FeatureEng.jsDivergence(a, a, "c").head().getLong(3) === 0L)
    val b = Seq("z", "z", "w").toDF("c")
    // fully disjoint supports → JSD = ln 2 = 693147 micro-nats
    assert(FeatureEng.jsDivergence(a, b, "c").head()
      .getLong(3) === 693147L)
  }

  // ---- TextAnalysis.tokenEntropy ---------------------------------------

  test("token entropy: constant 0, uniform ln k, hand mixed value") {
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a b c d"),
      (3L, "a a b b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) === ((4L, 0L)))
    assert(got(2L) === ((4L, 1386294L))) // ln 4
    // L=6, counts (2,3,1): H = ln6 − (2ln2 + 3ln3)/6
    // = 1791759 − (2·693147 + 3·1098612)/6 = 1791759 − 780355 = 1011404
    assert(got(3L) === ((6L, 1011404L)))
  }

  // ---- TimeSeries.acf ---------------------------------------------------

  test("acf: alternating series → r1 −5/6, r2 +4/6 of variance ratio") {
    // x = 2,1,2,1,2,1 over 6 consecutive days (a zero-count day has no
    // row at all — counts must stay positive): cx = (6x − 9) = ±3
    // den = 6·9 = 54; lag1: 5 pairs of −9 → −45/54 = −0.833333
    // lag2: 4 pairs of +9 → +36/54 = 0.666667
    val ev = (0 until 6).flatMap { i =>
      val n = if (i % 2 == 0) 2 else 1
      (0 until n).map(j =>
        (i.toLong * 10 + j, s"2024-03-0${i + 1} 12:00:00"))
    }.toDF("event_id", "tss")
      .select(col("event_id"), lit("t").as("grp"),
        to_timestamp(col("tss")).as("ts"))
    val got = TimeSeries.acf(ev, "grp", "ts", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(1L -> -833333L, 2L -> 666667L))
  }

  // ---- Similarity.mutualTopK -------------------------------------------

  test("mutual top-k keeps only reciprocal pairs") {
    // a and b are near-duplicates; c's nearest is a, but a's top-1 is b
    // (and vice versa) — with k = 1 only (a, b) is mutual
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f)),
      (3L, Array(0.5f, 0.86f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopK(emb, "vec_id", "embedding", 1,
      broadcastCorpus = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
    // k = 2 over 3 vectors: every pair is mutual
    val all = Similarity.mutualTopK(emb, "vec_id", "embedding", 2,
      broadcastCorpus = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
