package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Diff, EventAnalytics, Graph, Sampling, Stats,
  TimeSeries}

/** Hand-computed cases for the session-3 pipeline operators: BPE training,
  * k-core peeling, snapshot diff, weighted sampling, winsorized sums. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Bpe -----------------------------------------------------------

  test("bpe learns the most frequent pair first, ties on (lft, rgt)") {
    // "abab" x3, "ab" x2: pairs a-b 8 (2 per abab + 1 per ab), b-a 3
    val docs = Seq("abab abab abab ab ab").toDF("text")
    val got = Bpe.train(docs, "text", merges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 8L)))
  }

  test("bpe merge is greedy leftmost non-overlapping: aaa -> [aa, a]") {
    // corpus "aaa": round 1 merges (a,a) with count 2 (both adjacent
    // pairs); after the greedy rewrite the word is [aa, a] so round 2
    // sees exactly one (aa, a) pair
    val docs = Seq("aaa").toDF("text")
    val got = Bpe.train(docs, "text", merges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpe respects symbol boundaries: (a,b) never matches inside xa|by") {
    // after merging (x,a) and then (b,y) ... simpler direct case: words
    // where the character pair a,b only exists straddling the symbols
    // "xa","by" must not merge on rule (a,b). Build it: corpus gives
    // top pair (x,a) then (b,y), then (a,b) count must come only from
    // the true [a][b] word, not from [xa][by].
    val docs = Seq("xaby xaby xaby ab").toDF("text")
    val rules = Bpe.train(docs, "text", merges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    // round 1: pairs x-a 3, a-b 4, b-y 3 -> (a,b) wins with 4
    assert(rules.head == ((1, "a", "b", 4L)))
    // after the merge, "xaby" is [x, ab, y]: pair (x, ab) and (ab, y)
    // count 3 each -> round 2 picks (ab, y) by... (3,3) tie ->
    // lexicographic (lft, rgt): ("ab","y") < ("x","ab") so (ab,y) wins
    assert(rules(1) == ((2, "ab", "y", 3L)))
  }

  test("bpe vocab reads token frequencies off the final segmentation") {
    // corpus "abab abab ab": merges (a,b) then (ab,ab); final words are
    // [abab] x2 (freq 2) and [ab] x1
    val docs = Seq("abab abab ab").toDF("text")
    val got = Bpe.vocab(docs, "text", merges = 2, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("abab", 2L), ("ab", 1L)))
  }

  test("bpe compression counts corpus tokens under the learned merges") {
    // sources: s1 = "abab ab", s2 = "cd". merges (a,b) then (ab,ab):
    // abab -> 1 token, ab -> 1 token, cd -> 2 tokens (untouched chars)
    val docs = Seq(("abab ab", "s1"), ("cd", "s2")).toDF("text", "source")
    val got = Bpe.compression(docs, "text", "source", merges = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("s1", 2L, 2L), ("s2", 1L, 2L)))
  }

  test("bpe stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text")
    val got = Bpe.train(docs, "text", merges = 5).collect()
    assert(got.isEmpty) // all words are single symbols from round 1
  }

  // ---- Graph.kCore ---------------------------------------------------

  private def mirrored(pairs: Seq[(Long, Long)]) = {
    val fwd = pairs.toDF("src", "dst")
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("kCore peels cascades round by round") {
    // path 1-2-3-4 plus triangle 4-5-6: at k=2 round 1 drops the path
    // endpoints 1 (deg1)... deg: 1:1, 2:2, 3:2, 4:3, 5:2, 6:2
    // round 1 drops node 1; round 2: 2 has deg 1 -> drops; round 3:
    // 3 drops; round 4: 4,5,6 stable triangle (deg 2 each)
    val e = mirrored(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L)))
    def ids(rounds: Int) =
      Graph.kCore(e, k = 2, rounds = rounds).select("id")
        .as[Long].collect().toSet
    assert(ids(1) == Set(2L, 3L, 4L, 5L, 6L))
    assert(ids(2) == Set(3L, 4L, 5L, 6L))
    assert(ids(3) == Set(4L, 5L, 6L))
    assert(ids(4) == Set(4L, 5L, 6L)) // fixpoint
  }

  test("kCore reports degrees inside the surviving subgraph") {
    val e = mirrored(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L)))
    val got = Graph.kCore(e, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(4L -> 2L, 5L -> 2L, 6L -> 2L))
  }

  // ---- Diff.snapshotDiff ---------------------------------------------

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val prev = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (4L, "d", "w")).toDF("id", "p1", "p2")
    val next = Seq((2L, "b", "y"), (3L, "C", "z"), (4L, "d", "w"),
      (5L, "e", "v")).toDF("id", "p1", "p2")
    val got = Diff.snapshotDiff(prev, next, "id", Seq("p1", "p2"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("snapshotDiff distinguishes NULL from empty-string payload") {
    val prev = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("id", "p")
    val next = Seq((1L, Option("")), (2L, Option.empty[String])).toDF("id", "p")
    val got = Diff.snapshotDiff(prev, next, "id", Seq("p"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  // ---- Sampling.weightedSample ---------------------------------------

  test("weightedSample selection is exact and partitioning-independent") {
    val df = (1L to 200L).map(i => (i, (i % 13 + 1).toInt)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 20)
      .as[(Long, Int)].collect().toSet
    val b = Sampling.weightedSample(df.repartition(7), "id", "w", k = 20)
      .as[(Long, Int)].collect().toSet
    assert(a == b && a.size == 20)
    // replay the race on the driver: u from the shared char hash of the
    // id string, key = round(ln(u) * 1e6) / w, top-20
    val P = graft.functions.HashExprs.P
    def charHash(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)
    val expect = (1L to 200L).map { i =>
      val u = (charHash(i.toString) + 1.0) / (P + 1.0)
      val key = math.round(math.log(u) * 1e6).toDouble / (i % 13 + 1)
      (i, key)
    }.sortBy { case (i, key) => (-key, i) }.take(20).map(_._1).toSet
    assert(a.map(_._1) == expect)
  }

  test("weightedSample returns everything when k >= rows") {
    val df = Seq((1L, 5), (2L, 1)).toDF("id", "w")
    assert(Sampling.weightedSample(df, "id", "w", k = 10).count() == 2)
  }

  test("weightedSample excludes non-positive weights instead of erroring") {
    val df = Seq((1L, 5), (2L, 0), (3L, -2)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 10)
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 5)))
  }

  // ---- Stats.winsorizedSum -------------------------------------------

  test("winsorizedSum clamps to integer-rank percentile cuts") {
    // group g: values 1..20 -> n=20, loIdx=ceil(20*5/100)=1, hi=ceil(19)=19
    // lo = 1, hi = 19; sum = (1..19 sum) + clamp(20->19) = 190 + 19 = 209
    val df = (1L to 20L).map(v => ("g", v, v)).toDF("grp", "v", "rk")
    val got = Stats.winsorizedSum(df, "grp", "v", "rk")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 20L, 1L, 19L, 209L)))
  }

  test("winsorizedSum singleton group clamps to its own value") {
    val df = Seq(("g", 7L, 1L)).toDF("grp", "v", "rk")
    val got = Stats.winsorizedSum(df, "grp", "v", "rk")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 1L, 7L, 7L, 7L)))
  }

  // ---- Stats.madOutliers ---------------------------------------------

  test("madOutliers flags values beyond cut*mad, medians discrete") {
    // values 1..9 plus 100: lower median of 10 values = 5th = 5;
    // deviations |v-5| = 4,3,2,1,0,1,2,3,4,95 -> sorted 0,1,1,2,2,3,3,4,4,95
    // lower median (5th) = 2 -> cut 3*2=6 -> only 95 exceeds
    val df = ((1L to 9L) :+ 100L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "rk")
    val got = Stats.madOutliers(df, "grp", "v", "rk", cut = 3)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 10L, 5L, 2L, 1L)))
  }

  test("madOutliers zero-mad group counts every deviant value") {
    // 5 copies of 7 and one 8: med 7, deviations 0,0,0,0,0,1 -> mad 0;
    // cut*mad = 0 so the single 8 (dev 1 > 0) is the outlier
    val df = (Seq.fill(5)(7L) :+ 8L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "rk")
    val got = Stats.madOutliers(df, "grp", "v", "rk", cut = 3)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 6L, 7L, 0L, 1L)))
  }

  // ---- TimeSeries.twap -----------------------------------------------

  test("twap weights each value by its holding duration") {
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    // value 10 held 1s, value 2 held 3s, final value 100 unweighted:
    // twap = (10*1 + 2*3) / 4 = 4.0
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(1), 2.0), (1L, ts(4), 100.0))
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.twap(ev, "user_id", "ts", "value")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((1L, 3L, Some(4.0))))
  }

  test("twap single-observation key yields NULL") {
    import java.sql.Timestamp
    val ev = Seq((1L, new Timestamp(0L), 5.0)).toDF("user_id", "ts", "value")
    val got = TimeSeries.twap(ev, "user_id", "ts", "value")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((1L, 1L, None)))
  }

  // ---- TimeSeries.rollingFeatures -------------------------------------

  test("rollingFeatures emits lags and exact rolling sums per key") {
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    val ev = Seq((1L, ts(0), 1.0, 10L), (1L, ts(1), 2.0, 11L),
      (1L, ts(2), 3.0, 12L), (1L, ts(3), 4.0, 13L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = TimeSeries.rollingFeatures(ev, "user_id", "ts", "value",
        "event_id", win = 3)
      .orderBy("us")
      .as[(Long, Long, Long, Option[Long], Option[Long], Long, Long, Long)]
      .collect().toSeq
    val M = 1000000L
    assert(got == Seq(
      (1L, 0L, 1 * M, None, None, 1 * M, 1L, 1 * M),
      (1L, 1000000L, 2 * M, Some(1 * M), None, 3 * M, 2L, 2 * M),
      (1L, 2000000L, 3 * M, Some(2 * M), Some(1 * M), 6 * M, 3L, 3 * M),
      (1L, 3000000L, 4 * M, Some(3 * M), Some(2 * M), 9 * M, 3L, 4 * M)))
  }

  // ---- TimeSeries.mergeIntervals --------------------------------------

  test("mergeIntervals folds overlapping intervals into islands") {
    // [0,10],[5,8],[9,20] overlap into [0,20]x3; [30,40] stands alone;
    // an interval TOUCHING the running max end (s = prevMax) still merges
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 8L), (1L, 9L, 20L), (1L, 30L, 40L),
      (2L, 0L, 5L), (2L, 5L, 9L)).toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L),
      (2L, 0L, 9L, 2L)))
  }

  test("mergeIntervals contained interval extends nothing but counts") {
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L)).toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 100L, 2L)))
  }

  // ---- Stats.abcClassification ----------------------------------------

  test("abcClassification splits on exact cumulative-share cuts") {
    // totals: a=80, b=15, c=4, d=1 (total 100): a cum 80 -> A (<=80),
    // b cum 95 -> B (<=95), c cum 99 -> C, d cum 100 -> C
    val df = Seq(("a", 80L), ("b", 15L), ("c", 4L), ("d", 1L))
      .toDF("ent", "v")
    val got = Stats.abcClassification(df, "ent", "v")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("a" -> "A", "b" -> "B", "c" -> "C", "d" -> "C"))
  }

  test("abcClassification pre-aggregates entities and breaks ties by entity") {
    val df = Seq(("a", 30L), ("a", 20L), ("b", 50L)).toDF("ent", "v")
    val got = Stats.abcClassification(df, "ent", "v")
      .as[(String, Long, String)].collect().toSet
    // a and b both total 50: tie -> a ranks first (ent asc), cum 50 -> A;
    // b cum 100 -> C
    assert(got == Set(("a", 50L, "A"), ("b", 50L, "C")))
  }

  // ---- Profile.entropy / Profile.benford ------------------------------

  test("entropy: constant column 0, uniform column ln(k), nulls count") {
    val df = Seq((Option("x"), "a"), (Option("x"), "b"), (Option("x"), "c"),
      (Option.empty[String], "d")).toDF("c1", "c2")
    val got = graft.operators.Profile.entropy(df, Seq("c1", "c2"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // c1: {x:3, null:1} -> H = ln4 - (3·ln3 + 1·ln1)/4; c2: uniform ln4
    val ln4 = math.round(math.log(4) * 1e6)
    val ln3 = math.round(math.log(3) * 1e6)
    assert(got("c2") == ((4L, 4L, ln4)))
    assert(got("c1") == ((4L, 2L, ln4 - math.round(3.0 * ln3 / 4))))
  }

  test("benford counts leading digits against the expectation") {
    val df = Seq(1L, 1L, 19L, 2L, 3L, 0L, -5L).map(("g", _)).toDF("g", "v")
    val got = graft.operators.Profile.benford(df, "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // 0 and -5 are excluded; digits 1,1,1,2,3 over n=5
    assert(got == Map(1L -> ((3L, 1505150L)), 2L -> ((1L, 880456L)),
      3L -> ((1L, 624694L))))
  }

  // ---- Similarity.centroidPurity --------------------------------------

  test("centroidPurity counts vectors nearest their own label centroid") {
    // label 0 clusters near (0,0); label 1 near (10,10); one mislabeled
    // vector (id 5, labeled 0 but sitting at (10,10)) lowers label 0's
    // purity
    val emb = Seq(
      (1L, Array(0.0f, 0.1f), 0), (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(10.0f, 10.1f), 1), (4L, Array(10.1f, 10.0f), 1),
      (5L, Array(10.0f, 10.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .centroidPurity(emb, "vec_id", "embedding", "label")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // label 0 centroid is dragged toward (3.4, 3.4) by the mislabel, but
    // ids 1,2 stay nearest it while id 5 flips to label 1's centroid
    assert(got == Map(0 -> ((3L, 2L)), 1 -> ((2L, 2L))))
  }

  // ---- Stats.mutualInformation ----------------------------------------

  test("mutualInformation: 0 for independent, ln(2) for identical binary") {
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val gotI = Stats.mutualInformation(indep, "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(gotI == ((4L, 4L, 0L)))
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val gotD = Stats.mutualInformation(dep, "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(gotD == ((4L, 2L, math.round(math.log(2) * 1e6))))
  }

  // ---- Classifier.calibration -----------------------------------------

  test("calibration bins cover all rows and respect bin arithmetic") {
    // strongly separable 1-feature data so 3 GD steps spread the scores
    // across more than one decile
    val rows = (1 to 50).map(i => (i.toLong, 1.0, 1.0, 4.0)) ++
      (51 to 100).map(i => (i.toLong, 0.0, 1.0, -4.0))
    val feat = rows.toDF("id", "label", "x0", "x1")
    val got = graft.operators.Classifier.calibration(feat, Seq("x0", "x1"),
        steps = 3, lr = 0.25, bins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.map(_._2).sum == 100L)
    assert(got.forall { case (bin, n, nPos, obs, _) =>
      bin >= 0 && bin <= 9 && nPos <= n &&
        math.abs(obs - nPos.toDouble / n) < 1e-6 })
    assert(got.length >= 2)
    // the positive-label rows (x1 = +4) must land in higher bins than the
    // negative rows on average
    val posBin = got.filter(_._3 > 0).map(r => r._1 * r._2).sum
    val negBin = got.filter(_._3 == 0).map(r => r._1 * r._2).sum
    assert(posBin > negBin)
    // partitioning invariance: same bins from a differently-split input
    val got2 = graft.operators.Classifier.calibration(
        feat.repartition(7), Seq("x0", "x1"), steps = 3, lr = 0.25,
        bins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.sortBy(_._1).toSeq == got2.sortBy(_._1).toSeq)
  }

  // ---- Quality.validate -----------------------------------------------

  test("validate counts violations per rule, preserving contract order") {
    import graft.operators.Quality._
    val df = Seq(
      (Option(1L), Option(5.0), Option("O"), Option("A-1")),
      (Option(1L), Option(-1.0), Option("X"), Option("bad")),
      (Option.empty[Long], Option(200.0), Option.empty[String], Option("A-2")))
      .toDF("k", "price", "status", "code")
    val ref = Seq(1L).toDF("rk")
    val got = validate(df, Seq(
      NotNull("k"), Unique(Seq("k")), InRange("price", 0.0, 100.0),
      InSet("status", Seq("O", "F")), MatchesRegex("code", "^A-[0-9]$"),
      ForeignKey("k", ref, "rk")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("not_null(k)", 1L),          // one NULL key
      ("unique(k)", 1L),            // k=1 twice (nulls count as one key)
      ("in_range(price)", 2L),      // -1 and 200
      ("in_set(status)", 1L),       // X (null not counted)
      ("matches_regex(code)", 1L),  // "bad"
      ("foreign_key(k)", 0L)))      // both non-null keys exist in ref
  }

  test("validate reports zero violations on an empty ingest") {
    import graft.operators.Quality._
    val df = Seq.empty[(Option[Long], Option[String])].toDF("k", "s")
    val got = validate(df, Seq(NotNull("k"), Unique(Seq("k")),
        InSet("s", Seq("x"))))
      .as[(String, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, 0L, 0L))
  }

  // ---- Linkage.sortedNeighborhood --------------------------------------

  test("sortedNeighborhood catches matches across block boundaries") {
    // "alpha"/"alpho" share no 5-prefix block but are sort neighbors
    val df = Seq((1L, "alpha"), (2L, "alpho"), (3L, "beta"))
      .toDF("id", "name")
    val got = graft.operators.Linkage.sortedNeighborhood(df, "id", "name",
        col("name"), window = 2, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("sortedNeighborhood window bounds the comparison budget") {
    // window=2: only adjacent pairs compared — (a1, a3) at distance 1 in
    // NAME space but 2 apart in sort order is not emitted
    val df = Seq((1L, "aa"), (2L, "ab"), (3L, "ac")).toDF("id", "name")
    val got = graft.operators.Linkage.sortedNeighborhood(df, "id", "name",
        col("name"), window = 2, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  // ---- Graph.adamicAdar ------------------------------------------------

  test("adamicAdar scores non-adjacent pairs by 1/ln(deg) of shared nbrs") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share two deg-2
    // neighbors -> aa = 2 * round(1e6/ln 2); adjacent pairs excluded
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Graph.adamicAdar(pairs, None, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val t = math.round(1e6 / math.log(2))
    assert(got == Set((1L, 3L, 2L, 2 * t), (2L, 4L, 2L, 2 * t)))
  }

  test("adamicAdar maxDegree drops hub centers") {
    // star: hub 1 connects 2,3,4 -> leaf pairs share only the hub; cap 2
    // removes the hub as a center, leaving no candidate pairs
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    assert(graft.operators.Graph.adamicAdar(pairs, Some(2), 10).count() == 0)
    assert(graft.operators.Graph.adamicAdar(pairs, None, 10).count() == 3)
  }

  // ---- TimeSeries.seasonalResiduals ------------------------------------

  test("seasonalResiduals ranks events against their slot mean") {
    import java.sql.Timestamp
    def at(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour-0 slot mean = (1+1+4)/3 = 2.0 -> event 3 resid +2.0;
    // hour-1 slot has one event, resid 0
    val ev = Seq((1L, "t", at(0, 1), 1.0), (2L, "t", at(0, 2), 1.0),
      (3L, "t", at(0, 3), 4.0), (4L, "t", at(1, 0), 9.0))
      .toDF("event_id", "event_type", "ts", "value")
    val got = TimeSeries.seasonalResiduals(ev, "event_id", "event_type",
        "ts", "value", topK = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.head == ((3L, "t", 0L, 4000000L, 2000000L, 2000000L)))
    // ties at |resid| = 1e6 (events 1 and 2) break on id
    assert(got(1) == ((1L, "t", 0L, 1000000L, 2000000L, -1000000L)))
  }

  // ---- Stats.growthCurve / equiDepthHistogram --------------------------

  test("growthCurve counts first-seen entities per day with a cumulative") {
    import java.sql.Timestamp
    def at(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // user 1 first on day 1 (reappears day 3), users 2,3 on day 2
    val ev = Seq((1L, at(1)), (2L, at(2)), (3L, at(2)), (1L, at(3)))
      .toDF("user_id", "ts")
    val got = Stats.growthCurve(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2, r._3)).toSeq.sorted
    assert(got == Seq(("2024-01-01", 1L, 1L), ("2024-01-02", 2L, 3L)))
  }

  test("equiDepthHistogram bins cover all rows with ordered boundaries") {
    val df = (1L to 10L).map(v => (v, v)).toDF("v", "rk")
    val got = Stats.equiDepthHistogram(df, "v", "rk", buckets = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 1L, 2L), (2L, 2L, 3L, 4L), (3L, 2L, 5L, 6L),
      (4L, 2L, 7L, 8L), (5L, 2L, 9L, 10L)))
  }

  // ---- Stats.zipfFit ---------------------------------------------------

  test("zipfFit recovers the two-point slope exactly") {
    val freqs = Seq(("a", 100L), ("b", 10L)).toDF("tok", "f")
    val got = Stats.zipfFit(freqs, "tok", "f")
      .as[(Long, Option[Double], Option[Double])].collect().head
    // milli-nat grid replay: x = [0, 693], y = [4605, 2303]
    val (x1, x2) = (0.0, math.round(math.log(2) * 1e3).toDouble)
    val (y1, y2) = (math.round(math.log(100) * 1e3).toDouble,
      math.round(math.log(10) * 1e3).toDouble)
    val slope = (y2 - y1) / (x2 - x1)
    assert(got._1 == 2L)
    assert(math.abs(got._2.get - BigDecimal(slope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("zipfFit single-item table yields NULL slope") {
    val freqs = Seq(("a", 5L)).toDF("tok", "f")
    val got = Stats.zipfFit(freqs, "tok", "f")
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(got == ((1L, None, None)))
  }

  // ---- FeatureEng.quantileNormalize ------------------------------------

  test("quantileNormalize maps every group onto the pooled distribution") {
    // g1 = [1, 2], g2 = [100, 200]; pooled = [1, 2, 100, 200] -> both
    // groups normalize to [2, 200]: identical distributions afterwards,
    // the defining property
    val df = Seq((1L, "g1", 1L), (2L, "g1", 2L), (3L, "g2", 100L),
      (4L, "g2", 200L)).toDF("rk", "grp", "v")
    val got = graft.operators.FeatureEng
      .quantileNormalize(df, "grp", "v", "rk")
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._2).map { case (g, rs) => g -> rs.map(_._4).sorted.toSeq }
    assert(got == Map("g1" -> Seq(2L, 200L), "g2" -> Seq(2L, 200L)))
  }

  // ---- Similarity.centroidShift ----------------------------------------

  test("centroidShift measures per-label centroid L2 drift") {
    val a = Seq((1L, Array(0.0f, 0.0f), 0), (2L, Array(0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val b = Seq((3L, Array(3.0f, 4.0f), 0), (4L, Array(3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .centroidShift(a, b, "vec_id", "embedding", "label")
      .as[(Int, Long, Long, Double)].collect().head
    assert(got == ((0, 2L, 2L, 5.0)))
  }

  // ---- Stats.poissonBootstrap -------------------------------------------

  test("poissonBootstrap CI brackets the mean and is partition-invariant") {
    val df = (1L to 400L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val a = Stats.poissonBootstrap(df, "id", "v", replicas = 64)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (n, mean, b, lo, hi) = a
    assert(n == 400L && b == 64L)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] vs mean $mean")
    // the band must be a real interval, not collapsed to a point
    assert(lo < hi)
    val c = Stats.poissonBootstrap(df.repartition(7), "id", "v", 64)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(a == c)
  }

  test("poisson weights average ~1 over many draws (resampling validity)") {
    val df = (1L to 500L).map(i => (i, 1.0)).toDF("id", "v")
    // with v constant 1, every replica mean is exactly 1e6 regardless of
    // weights — but total weight must be near B*n if weights average 1;
    // check via a single replica's weight sum through the public surface:
    // mean of constant data is exact, so just assert the CI collapses
    val r = Stats.poissonBootstrap(df, "id", "v", replicas = 32)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r._2 == 1000000L && r._4 == 1000000L && r._5 == 1000000L)
  }

  // ---- Stats.abTest ------------------------------------------------------

  test("abTest: clear effect excludes zero; same arms straddle zero") {
    import scala.util.Random
    val rnd = new Random(7)
    val big = (1L to 300L).map(i => ("A", i, 100.0 + rnd.nextInt(10))) ++
      (301L to 600L).map(i => ("B", i, 50.0 + rnd.nextInt(10)))
    val d1 = big.toDF("g", "id", "v")
    val r1 = Stats.abTest(d1, "g", "A", "B", "id", "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r1._1 == 300L && r1._2 == 300L)
    assert(r1._6 > 0L, s"clear effect must exclude zero: $r1") // ci_lo > 0
    assert(r1._6 <= r1._5 && r1._5 <= r1._7) // diff inside its own band
    // identical distributions -> band straddles zero
    val same = (1L to 300L).map(i => ("A", i, (i % 50).toDouble)) ++
      (301L to 600L).map(i => ("B", i, (i % 50).toDouble))
    val r2 = Stats.abTest(same.toDF("g", "id", "v"), "g", "A", "B",
        "id", "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r2._6 <= 0L && r2._7 >= 0L, s"null effect must straddle: $r2")
  }

  // ---- plan shapes ----------------------------------------------------

  private def hashShuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString()).length

  test("twap plans exactly one hash shuffle (window + agg share the key)") {
    val ev = graft.queries.Tables.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val df = TimeSeries.twap(ev, "user_id", "ts", "value")
    assert(hashShuffles(df) === 1,
      s"plan:\n${df.queryExecution.executedPlan}")
  }

  test("mergeIntervals plans exactly one hash shuffle") {
    val ev = graft.queries.Tables.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val iv = ev.select(col("user_id"), unix_micros(col("ts")).as("s0"),
      (unix_micros(col("ts")) + 7200000000L).as("e0"))
    val df = TimeSeries.mergeIntervals(iv, "user_id", "s0", "e0")
    assert(hashShuffles(df) === 1,
      s"plan:\n${df.queryExecution.executedPlan}")
  }

  test("snapshotDiff shuffles digests, never the payload") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Diff.snapshotDiff(docs, docs, "doc_id", Seq("text", "source"))
    // every Exchange in the plan must carry only (key, 32-char digest)
    // columns — the text/source payload is projected away pre-shuffle
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(l => l.contains("text") || l.contains("source")),
      s"payload crossed a shuffle:\n$plan")
  }

  // ---- Stats.rfm -------------------------------------------------------

  test("rfm quintile-scores entities against the data's own anchor") {
    import java.sql.Date
    def day(d: Int) = Date.valueOf(f"2024-01-${d}%02d")
    // 5 customers, strictly ordered on all three metrics: customer i has
    // recency i-1 days, i orders, i*100 cents total
    val rows = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, day(10 - (i - 1)), 100L))
    }
    val df = rows.toDF("cust", "d", "cents")
    val got = Stats.rfm(df, "cust", "d", "cents")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    // customer 1: most recent but fewest orders/lowest spend -> r=5,f=1,m=1
    assert(got(1L) == ((1L, 0L, 1L, 100L, 5L, 1L, 1L, "511")))
    // customer 5: least recent but top frequency/monetary
    assert(got(5L) == ((5L, 4L, 5L, 500L, 1L, 5L, 5L, "155")))
    assert(got(3L) == ((3L, 2L, 3L, 300L, 3L, 3L, 3L, "333")))
  }

  // ---- EventAnalytics.attribution ------------------------------------

  test("attribution credits first and last touch, (none) when untouched") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    // user 1: view@1, click@2, purchase@3 -> last=click, first=view
    // user 2: purchase@1 (no touch) -> (none) in both models
    // user 3: click@5, purchase@4 -> touch is AFTER conv: (none)/(none)
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "purchase"),
      (3L, ts(5), "click"), (3L, ts(4), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.attribution(ev, "user_id", "ts", "event_type",
        "purchase", Seq("click", "view"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "click" -> ((1L, 0L)), "view" -> ((0L, 1L)), "(none)" -> ((2L, 2L))))
  }

  test("topPaths sessionizes by gap and truncates paths to maxLen") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    // user 1: a,b,c at 0/1/2 then (gap > 30m) d at 60 -> paths "a>b>c", "d"
    // user 2: a,b,c at 0/1/2 -> "a>b>c"; maxLen=2 cuts to "a>b"
    val ev = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "c", 3L),
      (1L, ts(60), "d", 4L),
      (2L, ts(0), "a", 5L), (2L, ts(1), "b", 6L), (2L, ts(2), "c", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.topPaths(ev, "user_id", "ts", "event_type",
        "event_id", gapMicros = 1800L * 1000000L, maxLen = 2, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b" -> 2L, "d" -> 1L))
  }

  test("topPaths orders ties by the tie column inside a path") {
    import java.sql.Timestamp
    val t0 = new Timestamp(0L)
    val ev = Seq((1L, t0, "z", 2L), (1L, t0, "a", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.topPaths(ev, "user_id", "ts", "event_type",
        "event_id", gapMicros = 1000L, maxLen = 5, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>z" -> 1L))
  }

  test("attribution counts a touch at the conversion instant") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    val ev = Seq((1L, ts(2), "click"), (1L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.attribution(ev, "user_id", "ts", "event_type",
        "purchase", Seq("click", "view"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("click" -> ((1L, 1L))))
  }
}
