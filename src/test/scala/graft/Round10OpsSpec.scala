package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, IncrementalAgg, Sampling, Stats, TextAnalysis, TimeSeries}

/** Hand-computed cases for the round-10 operators: CUSUM change detection,
  * chi-square independence, BFS reachability, incremental aggregate
  * maintenance, temperature-scaled sampling. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- TimeSeries.cusum ----------------------------------------------

  test("cusum accumulates on a level shift and resets on a dip") {
    // series 1,1,1,5,5 (mean 2.6, k = 1.3): z/(den·n) = x − 3.9 →
    // manual S: max(0, −2.9) = 0, 0, 0, then 1.1, 2.2 — argmax at the
    // last day of the shifted regime
    val ev = Seq(
      ("g", "2024-01-01", 1.0), ("g", "2024-01-02", 1.0),
      ("g", "2024-01-03", 1.0), ("g", "2024-01-04", 5.0),
      ("g", "2024-01-05", 5.0))
      .toDF("grp", "ds", "v")
      .withColumn("ts", to_timestamp(col("ds")))
    val got = TimeSeries.cusum(ev, "grp", "ts", "v")
      .orderBy(col("d"))
      .select(col("s_micro")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 1100000L, 2200000L))
  }

  test("cusum on a constant series is identically zero") {
    val ev = (1 to 6).map(i => ("g", f"2024-01-$i%02d", 2.0))
      .toDF("grp", "ds", "v")
      .withColumn("ts", to_timestamp(col("ds")))
    val got = TimeSeries.cusum(ev, "grp", "ts", "v")
      .select(col("s_micro")).as[Long].collect().toSet
    assert(got == Set(0L))
  }

  // ---- Stats.chiSquare -----------------------------------------------

  test("chi-square is zero under exact independence") {
    // 2x2 with perfectly proportional margins: o = ra·cb/N in every cell
    val df = (Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val row = Stats.chiSquare(df, "a", "b").head()
    assert(row.getAs[Long]("n") == 60L)
    assert(row.getAs[Long]("dof") == 1L)
    assert(row.getAs[Long]("chi2_micro") == 0L)
  }

  test("chi-square matches the hand value on a dependent 2x2") {
    // cells: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30; N=80, all margins 40.
    // chi2 = Σ (o−20)²/20 = 4·(100/20) = 20 exactly
    val df = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q")))
      .toDF("a", "b")
    val row = Stats.chiSquare(df, "a", "b").head()
    assert(row.getAs[Long]("chi2_micro") == 20000000L)
  }

  test("chi-square folds NULL to a category instead of dropping rows") {
    val df = Seq(("x", Some("p")), ("x", None), ("y", Some("p")),
      ("y", None)).toDF("a", "b")
    val row = Stats.chiSquare(df, "a", "b").head()
    assert(row.getAs[Long]("n") == 4L)
    assert(row.getAs[Long]("c_cats") == 2L)
  }

  // ---- Graph.reachability --------------------------------------------

  test("reachability reports minimal hop distance, depth-bounded") {
    // path 1→2→3→4→5 plus shortcut 1→4: dist(4) must be 1 (not 3),
    // dist(5) = 2; node 6 disconnected; depth 2 excludes nothing here
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (6L, 6L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.reachability(edges, seeds, maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("reachability stops early when the frontier drains") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.reachability(edges, seeds, maxDepth = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  // ---- IncrementalAgg ------------------------------------------------

  test("merged partial states equal the full recompute bit-for-bit") {
    val df = Seq(("a", 1.5), ("a", 2.25), ("b", -1.0), ("a", 0.125),
      ("b", 7.0)).toDF("k", "v")
    val full = IncrementalAgg.readout(
      IncrementalAgg.state(df, Seq("k"), "v"))
    val halves = Seq(df.limit(2), df.exceptAll(df.limit(2)))
      .map(IncrementalAgg.state(_, Seq("k"), "v"))
    val merged = IncrementalAgg.readout(
      IncrementalAgg.merge(halves, Seq("k")))
    assert(merged.orderBy("k").collect().toSeq ==
      full.orderBy("k").collect().toSeq)
  }

  // ---- Graph.personalizedPageRank ------------------------------------

  test("ppr mass stays anchored to the seed, decays with distance") {
    // 1 -> 2 -> 3 -> 1 cycle, seed {1}: the fixpoint is r1 = 0.15 +
    // 0.85·r3 → (0.389, 0.330, 0.281) — seed highest, decaying along the
    // walk. Early rounds transiently pile mass on the far node (round 2:
    // r3 = 0.7225), so convergence needs iterations: 0.614^12 ≈ 3e-3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("ppr on disjoint components gives non-seed components zero") {
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r.contains(1L) && r.contains(2L))
    assert(!r.contains(10L) && !r.contains(11L))
  }

  test("ppr teleport + flow conserves integer mass within rounding") {
    // total mass each round = teleport-share + damped flow: bounded by
    // scale, never exceeds it (integer divisions only lose mass)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, iters = 4)
      .agg(sum(col("rank"))).as[Long].head()
    assert(r <= 1000000000000L && r > 990000000000L)
  }

  // ---- JaroWinkler ---------------------------------------------------

  test("jaro-winkler kernel matches the textbook values") {
    import graft.functions.JaroWinklerImpl.jw
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: adjacent swap can't match
    // boost threshold: prefix bonus must NOT apply at J <= 0.7
    assert(math.abs(jw("ab", "axyz") - 0.5833333333333334) < 1e-12)
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
  }

  test("jaro-winkler column expression equals the kernel, both eval paths") {
    import graft.functions.JaroWinkler.jaroWinkler
    import graft.functions.JaroWinklerImpl
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("aaapppp", "ap"), ("Customer#1204", "Customer#1240"))
      .toDF("a", "b")
    val viaExpr = df.select(jaroWinkler(col("a"), col("b"))).as[Double]
      .collect().toSeq
    val viaKernel = df.as[(String, String)].collect()
      .map { case (a, b) => JaroWinklerImpl.jw(a, b) }.toSeq
    assert(viaExpr == viaKernel)
    // null propagates
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  // ---- TextAnalysis.curriculum ---------------------------------------

  test("curriculum stages cut easy to hard with shuffled within-stage order") {
    // 8 docs, 2 stages: the 4 shortest-word docs must land in stage 1
    val docs = Seq(
      (1L, "a b c d"), (2L, "aa bb cc"), (3L, "x y"), (4L, "ab cd"),
      (5L, "lengthy wording here"), (6L, "substantial verbiage"),
      (7L, "considerable terminology"), (8L, "extensive vocabulary"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.curriculum(docs, "doc_id", "text", nStages = 2)
    val byStage = got.select(col("stage"), col("id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byStage(1L) == Set(1L, 2L, 3L, 4L))
    assert(byStage(2L) == Set(5L, 6L, 7L, 8L))
    // ord_in_stage is a permutation of 1..4 within each stage
    val ords = got.filter(col("stage") === 1)
      .select(col("ord_in_stage")).as[Long].collect().toSet
    assert(ords == Set(1L, 2L, 3L, 4L))
  }

  // ---- KMeans.silhouette ---------------------------------------------

  test("silhouette separates two tight far-apart clusters near +1") {
    // two clusters at 0 and 100 with tiny spread: a ≈ 0-ish, b ≈ 10000
    // in squared units → mean s per cluster must be > 0.9
    val vecs = (Seq((1L, 0.0f), (2L, 0.1f), (3L, -0.1f),
      (4L, 100.0f), (5L, 100.1f), (6L, 99.9f)))
      .map { case (id, v) => (id, Array(v, v)) }
      .toDF("id", "vec")
    val got = graft.operators.KMeans
      .silhouette(vecs, "id", "vec", k = 2, iters = 2)
      .select(col("mean_sil_micro")).as[Long].collect()
    assert(got.length == 2 && got.forall(_ > 900000L))
  }

  test("silhouette defines s = 0 when both distances are zero") {
    // all points identical: both centroids collapse onto the data point,
    // da = db = 0 — the 0/0 guard must yield 0, not NaN/NULL
    val vecs = (1L to 4L).map(id => (id, Array(1.0f, 1.0f)))
      .toDF("id", "vec")
    val got = graft.operators.KMeans
      .silhouette(vecs, "id", "vec", k = 2, iters = 1)
      .select(col("mean_sil_micro")).as[Long].collect()
    assert(got.forall(_ == 0L))
  }

  // ---- Multimodal.segmentPhashPairs ----------------------------------

  test("segment phash finds the shared segment across two payloads") {
    import graft.operators.Multimodal
    // two payloads sharing an identical second half (the "same intro"
    // case); halves are long and byte-diverse so fingerprints are nonzero
    val shared = (0 until 256).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val a = (0 until 256).map(i => ((i * 53 + 7) % 256).toByte).toArray ++ shared
    val b = (0 until 256).map(i => ((i * 91 + 3) % 256).toByte).toArray ++ shared
    val df = Seq((1L, a), (2L, b)).toDF("id", "media")
    val pairs = Multimodal
      .segmentPhashPairs(df, "id", "media", nSegs = 2, maxHamming = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // identical second halves → (1, seg1) x (2, seg1) at hamming 0
    assert(pairs.contains((1L, 1L, 2L, 1L, 0L)))
    // the unrelated first halves must NOT pair at hamming 0
    assert(!pairs.exists { case (ia, sa, ib, sb, _) =>
      ia == 1L && ib == 2L && sa == 0L && sb == 0L })
  }

  test("segment phash drops zero-fingerprint (flat) segments") {
    import graft.operators.Multimodal
    // constant bytes → no gradient bits → f = 0 → no pairs at all
    val flat = Array.fill[Byte](512)(42)
    val df = Seq((1L, flat), (2L, flat)).toDF("id", "media")
    val pairs = Multimodal
      .segmentPhashPairs(df, "id", "media", nSegs = 4, maxHamming = 6)
    assert(pairs.isEmpty)
  }

  // ---- Sampling.temperatureSample ------------------------------------

  test("temperature sampling flattens the mix toward sqrt weights") {
    // groups: big 90 rows, small 10 rows. √90 : √10 ≈ 3:1 (vs 9:1 raw),
    // total 40 → quotas round(40·0.75)=30 and round(40·0.25)=10
    val df = ((1 to 90).map(i => (i.toLong, "big")) ++
      (101 to 110).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val got = Sampling.temperatureSample(df, "grp", "id", total = 40L)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("small") == 10L)
    assert(got("big") == 30L)
  }

  test("temperature sampling is deterministic under repartitioning") {
    val df = (1 to 50).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val a = Sampling.temperatureSample(df, "grp", "id", 20L)
      .collect().toSet
    val b = Sampling.temperatureSample(df.repartition(7), "grp", "id", 20L)
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  // ---- Stats.mannWhitneyU --------------------------------------------

  test("mann-whitney matches the hand value on disjoint samples") {
    // A = {1,2,3}, B = {4,5,6}: R_A = 6, U_A = 0 (A entirely below B);
    // z = (0 − 4.5)/sqrt(3·3·7/12) = −4.5/√5.25 = −1.963961 (no ties)
    val df = (Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (4.0, "b"), (5.0, "b"), (6.0, "b"))).toDF("v", "g")
    val row = Stats.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(row.getAs[Long]("n_a") == 3L && row.getAs[Long]("n_b") == 3L)
    assert(row.getAs[Long]("u_a_x2") == 0L)
    assert(row.getAs[Double]("z") == -1.963961)
  }

  test("mann-whitney midranks keep ties exact") {
    // A = {1,1}, B = {1,2}: the three 1s share midrank 2 → R_A = 4,
    // U_A = 1 → doubled statistic 2
    val df = Seq((1.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    val row = Stats.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(row.getAs[Long]("u_a_x2") == 2L)
  }

  test("mann-whitney all-tied degenerate case yields NULL z, not NaN") {
    // every value identical across both groups → tie-corrected variance 0
    val df = Seq((7.0, "a"), (7.0, "a"), (7.0, "b"), (7.0, "b"))
      .toDF("v", "g")
    // all tied → midrank 2.5 each → U_A = n_a·n_b/2 = 2 (doubled: 4),
    // exactly the null mean — only the variance degenerates
    val row = Stats.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(row.getAs[Long]("u_a_x2") == 4L)
    assert(row.isNullAt(row.fieldIndex("z")))
  }

  test("mann-whitney/ks refuse a non-compact value domain") {
    val wide = spark.range(200)
      .select((col("id").cast("double") / 7.0).as("v"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("g"))
    val eMw = intercept[IllegalArgumentException] {
      Stats.mannWhitneyU(wide, "g", "v", "a", "b",
        maxDistinctValues = 100)
    }
    assert(eMw.getMessage.contains("valScale"))
    val eKs = intercept[IllegalArgumentException] {
      Stats.ksTest(wide, "g", "v", "a", "b", maxDistinctValues = 100)
    }
    assert(eKs.getMessage.contains("valScale"))
    // coarsening valScale brings the domain back under the cap
    assert(Stats.mannWhitneyU(wide, "g", "v", "a", "b", valScale = 1.0,
      maxDistinctValues = 100).count() == 1L)
  }

  // ---- Stats.ksTest --------------------------------------------------

  test("ks statistic and witness value match the hand ECDFs") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at x = 2 (F_a = .5, F_b = 0)
    // → D = 0.5; witness reported in integerized (×1e6) units
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map((_, "a")) ++
      Seq(3.0, 4.0, 5.0, 6.0).map((_, "b"))).toDF("v", "g")
    val row = Stats.ksTest(df, "g", "v", "a", "b").head()
    assert(row.getAs[Long]("d_micro") == 500000L)
    assert(row.getAs[Long]("at_v") == 2000000L)
  }

  test("ks on identical samples is zero") {
    val df = (Seq(1.0, 2.0, 3.0).map((_, "a")) ++
      Seq(1.0, 2.0, 3.0).map((_, "b"))).toDF("v", "g")
    assert(Stats.ksTest(df, "g", "v", "a", "b")
      .head().getAs[Long]("d_micro") == 0L)
  }

  // ---- Graph.modularity ----------------------------------------------

  test("modularity numerators match the barbell hand value") {
    // two triangles {1,2,3} / {4,5,6} bridged by (3,4): m = 7,
    // each side e_c = 3, d_c = 7 → num_c = 4·7·3 − 49 = 35 per side
    // (Q = 70/196 ≈ 0.357)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val comms = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("id", "comm")
    val got = Graph.modularity(edges, comms)
      .select("comm", "e_intra", "d_tot", "num_c")
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, e, d, n) => c -> ((e, d, n)) }.toMap
    assert(got("x") == ((3L, 7L, 35L)) && got("y") == ((3L, 7L, 35L)))
  }

  test("modularity of a random-equivalent split is non-positive") {
    // one community holding the whole graph: e_c = m, d_c = 2m →
    // num_c = 4m² − 4m² = 0 (the Q = 0 identity)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val comms = Seq((1L, "all"), (2L, "all"), (3L, "all")).toDF("id", "comm")
    assert(Graph.modularity(edges, comms).head().getAs[Long]("num_c") == 0L)
  }

  // ---- Sharding.rendezvousAssign -------------------------------------

  test("rendezvous assignment is total, in-range, and spread") {
    import graft.operators.Sharding
    val keys = (1 to 1000).map(i => s"key$i").toDF("k")
    val got = Sharding.rendezvousAssign(keys, "k", 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(got.keySet.subsetOf((0L until 8L).toSet))
    assert(got.keySet.size == 8, s"all shards used, got ${got.keySet}")
    assert(got.values.sum == 1000L)
  }

  test("native rendezvous shard matches the HOF chain bit-for-bit") {
    import graft.operators.Sharding
    // adversarial key mix: plain, numeric, empty, ':' inside, non-ASCII
    // (the split('')/ascii() code-point stream), long keys; 12 shards so
    // multi-digit prefixes hit the native digit loop
    val keys = ((1 to 300).map(i => s"key$i") ++
      (1 to 300).map(_.toString) ++
      Seq("", ":", "a:b", "héllo wörld", "日本語テキスト",
        "x" * 500)).toDF("k")
    for (n <- Seq(1, 8, 12, 101)) {
      val native = Sharding.rendezvousAssign(keys, "k", n)
        .select(col("k"), col("shard"))
      val hof = keys.withColumn("shard_hof",
        expr(Sharding.hofShardExpr("CAST(`k` AS STRING)", n)))
      val bad = native.join(hof, "k")
        .filter(col("shard") =!= col("shard_hof")).count()
      assert(bad == 0L, s"nShards=$n")
    }
  }

  test("rendezvous shard growth moves keys ONLY to the new shard") {
    // THE rendezvous property: growing 8 → 9 shards, every key whose
    // assignment changes must land on shard 8 — untouched shards keep
    // their files verbatim at re-shard time
    import graft.operators.Sharding
    val keys = (1 to 500).map(i => s"key$i").toDF("k")
    val a8 = Sharding.rendezvousAssign(keys, "k", 8)
      .select(col("k"), col("shard").as("s8"))
    val a9 = Sharding.rendezvousAssign(keys, "k", 9)
      .select(col("k"), col("shard").as("s9"))
    val moved = a8.join(a9, "k").filter(col("s8") =!= col("s9"))
      .select("s9").as[Long].collect()
    assert(moved.nonEmpty && moved.forall(_ == 8L),
      s"moved keys must all land on the new shard, got ${moved.toSet}")
  }

  // ---- Graph.hits ----------------------------------------------------

  test("hits matches the hand-run L1 power iteration") {
    // edges 1→3, 2→3, 2→4; scale 1e6, unit 250000.
    // round 1: aRaw={3:500000,4:250000} ta=750000 → a={3:666666,4:333333}
    //          hRaw={1:666666,2:999999} th=1666665 → h={1:400000,2:600000}
    // round 2: aRaw={3:1000000,4:600000} ta=1600000 → a={3:625000,4:375000}
    //          hRaw={1:625000,2:1000000} th=1625000 → h={1:384615,2:615384}
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(3L) == ((625000L, 0L)) && got(4L) == ((375000L, 0L)))
    assert(got(1L) == ((0L, 384615L)) && got(2L) == ((0L, 615384L)))
  }

  test("hits refuses iters <= 0 instead of NPEing at the final join") {
    val edges = Seq((1L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.hits(edges, iters = 0)
    }
    assert(e.getMessage.contains("iters"))
  }

  // ---- Ranking.textrankKeywords --------------------------------------

  test("textrank ranks the co-occurrence hub word first") {
    import graft.operators.Ranking
    // 'core' neighbors every other word; satellites only touch 'core' —
    // the hub must out-rank all satellites at any iteration count
    val docs = Seq(
      (1L, "core alpha core beta core gamma"),
      (2L, "delta core epsilon core zeta core")).toDF("doc_id", "text")
    val out = Ranking.textrankKeywords(docs, "doc_id", "text",
      iters = 2, topN = 3).as[(String, Long, Long)].collect()
    assert(out.head._1 == "core" && out.head._3 == 1L)
    assert(out.length == 3)
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted.reverse,
      "ranks must be emitted in descending score order")
  }

  // ---- BasketAnalysis.itemCosine -------------------------------------

  test("item cosine matches hand values and enforces the user cap") {
    import graft.operators.BasketAnalysis
    // u1:{A,B} u2:{A,B} u3:{A,C} → n(A)=3 n(B)=2 n(C)=1; c(AB)=2 c(AC)=1
    // cos(A,B)=2/√6→816497 micro; cos(A,C)=1/√3→577350 micro
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("u", "it")
    val got = BasketAnalysis.itemCosine(df, "u", "it", topK = 5)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("A", "B")) == ((2L, 816497L, 1L)))
    assert(got(("A", "C")) == ((1L, 577350L, 2L)))
    assert(got(("B", "A")) == ((2L, 816497L, 1L)))
    // a 3-item user over cap 2 is dropped WHOLE: its pairs and its norm
    // contributions vanish together
    val wide = df.union(Seq((4L, "A"), (4L, "B"), (4L, "C")).toDF("u", "it"))
    val capped = BasketAnalysis.itemCosine(wide, "u", "it", topK = 5,
      maxUserItems = Some(2))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(capped == got, "over-cap user must not change any statistic")
  }

  // ---- Dedup.prefixJaccardPairs --------------------------------------

  test("prefix-filter jaccard matches the uncapped exact path completely") {
    import graft.operators.Dedup
    // near-dup pair (0/1: one word changed), a containment-ish pair, and
    // unrelated docs; the prefix filter must reproduce EXACTLY the pairs
    // of the exhaustive postings path at the same threshold
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "totally different words appear in this document here now yes"))
      .toDF("doc_id", "text")
    val pf = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 700)
    val got = pf.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want && got.contains((2L, 3L)),
      s"prefix filter must be lossless: got $got want $want")
    // identical docs: 8 shared 3-shingles of 8 → jac 1.0 exactly
    val row = pf.filter(col("id_a") === 2L).head()
    assert(row.getAs[Long]("inter") == 8L &&
      row.getAs[Long]("jac_micro") == 1000000L)
    pf.unpersist()
  }

  test("ppjoin filters stay lossless at the threshold boundary") {
    import graft.operators.Dedup
    // exact-threshold pair (7 shared of 8+8 → J = 7/9 ≥ 0.7), a
    // just-below pair (6 of 8+8 → J = 0.6), and a size-skewed pair the
    // LENGTH filter must prune at candidate time (4 vs 12 tokens → even
    // full containment caps J at 1/3)
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g z"),
      (3L, "a b c d e f y x"),
      (4L, "a b c d"),
      (5L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    val tok = docs.select(col("doc_id").as("id"),
      explode(split(col("text"), " ")).as("s"))
    val got = Dedup.prefixJaccardPairsFromTokens(tok, 700)
      .select("id_a", "id_b", "jac_micro")
      .as[(Long, Long, Long)].collect().toSet
    // brute-force oracle over all C(5,2) pairs
    val sets = Map(1L -> "abcdefgh", 2L -> "abcdefgz", 3L -> "abcdefyx",
      4L -> "abcd", 5L -> "abcdefghijkl").view.mapValues(_.toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      un = (sets(a) ++ sets(b)).size
      if inter * 1000 >= 700 * un
    } yield (a, b, 1000000L * inter / un)).toSet
    assert(got == want, s"got $got want $want")
    assert(got.contains((1L, 2L, 777777L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix jaccard is robust to a non-distinct token table") {
    import graft.operators.Dedup
    val tok = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "c"))
      .toDF("id", "s")
    // duplicates must not inflate sizes/df/intersections: J(1,2) = 1.0
    val got = Dedup.prefixJaccardPairsFromTokens(tok, 700)
      .select("id_a", "id_b", "inter", "jac_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 1000000L)))
  }

  // ---- EventAnalytics.stationaryDistribution -------------------------

  test("markov stationary masses match the hand-run integer rounds") {
    import graft.operators.EventAnalytics
    // u1: a,b,a,b → a→b ×2, b→a ×1; u2: a,c → a→c ×1; c is a sink
    // (self-looped). 3 rounds from uniform 333333333:
    // x3 = {a: 222222222, b: 148148148, c: 629629629}
    val ev = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 11L), (1L, 3L, "a", 12L),
      (1L, 4L, "b", 13L), (2L, 1L, "a", 20L), (2L, 2L, "c", 21L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.stationaryDistribution(ev, "user_id", "ts",
        "event_type", "event_id", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 222222222L, "b" -> 148148148L,
      "c" -> 629629629L))
  }
}
