package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classifier, Linkage, Ranking, TimeSeries}

/** Round-9 curation operators: blocked fuzzy linkage, resample+LOCF,
  * rate anomaly, GD classifier, RRF fusion. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Linkage -------------------------------------------------------

  test("fuzzyPairs finds within-block pairs under the distance cap only") {
    val df = Seq((1L, "alpha"), (2L, "alphx"), (3L, "alzzz"), (4L, "beta"),
      (5L, "betas")).toDF("id", "name")
    val got = Linkage.fuzzyPairs(df, "id", "name",
        substring(col("name"), 1, 2), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) dist 1 same block; (1,3) dist 3 same block -> dropped;
    // (4,5) dist 1; cross-block alpha/beta never compared
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("fuzzyPairs maxBlockSize drops oversized blocks entirely") {
    val df = (1L to 10L).map(i => (i, s"aa$i")).toDF("id", "name")
      .union(Seq((20L, "zz1"), (21L, "zz2")).toDF("id", "name"))
    val got = Linkage.fuzzyPairs(df, "id", "name",
        substring(col("name"), 1, 2), maxDist = 1, maxBlockSize = Some(5))
      .select("id_a").as[Long].collect()
    assert(got.forall(_ >= 20L), "aa-block (10 members) must be dropped")
  }

  // ---- TimeSeries ----------------------------------------------------

  test("resampleLocf fills gaps with the last observation and flags them") {
    val h = 3600000000L // 1h in us
    val ev = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (1L, 3 * h, 40.0))
      .toDF("user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = TimeSeries.resampleLocf(ev, "user_id", "ts", "value", 3600)
      .orderBy("bin_us")
      .select("bin_us", "value", "is_gap")
      .as[(Long, Double, Boolean)].collect()
    assert(got.toSeq == Seq(
      (0L, 15.0, false),      // two obs in bucket 0 -> avg
      (h, 15.0, true),        // gap -> carried forward
      (2 * h, 15.0, true),    // still carried
      (3 * h, 40.0, false)))
  }

  test("resampleLocf grid is per-key: no buckets before a key's first obs") {
    val h = 3600000000L
    val ev = Seq((1L, 0L, 1.0), (2L, 2 * h, 5.0)).toDF("user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = TimeSeries.resampleLocf(ev, "user_id", "ts", "value", 3600)
      .groupBy("key").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("resampleInterp blends interior gaps linearly, LOCF after the last obs") {
    val h = 3600000000L
    // obs at buckets 0 (10.0) and 3 (40.0); bucket 4 observed 0-avg? no —
    // grid ends at the max observed bucket, so add a later gap via bucket 5
    val ev = Seq((1L, 0L, 10.0), (1L, 3 * h, 40.0), (1L, 5 * h, 40.0))
      .toDF("user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = graft.operators.TimeSeries
      .resampleInterp(ev, "user_id", "ts", "value", 3600)
      .orderBy("bin_us").select("value_micro", "is_gap")
      .as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((10000000L, false), (20000000L, true),
      (30000000L, true), (40000000L, false), (40000000L, true),
      (40000000L, false)))
  }

  test("targetEncodeLoo excludes the row itself; singleton category is NULL") {
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 7.0)).toDF("id", "cat", "y")
    val got = graft.operators.FeatureEng.targetEncodeLoo(df, "cat", "y")
      .select("id", "enc").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got == Map(1L -> 25.0, 2L -> 20.0, 3L -> 15.0, 4L -> null))
  }

  test("rateAnomaly z-scores against the group's own moments") {
    // counts per bucket: 1,1,4 -> mean 2, var (1+1+16)/3 - 4 = 2
    val h = 3600000000L
    val rows = Seq(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2)
      .map { case (id, b) => (id, "a", b * h + 1L) }
    val ev = rows.toDF("event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = TimeSeries.rateAnomaly(ev, "event_type", "ts", 3600)
      .orderBy("bin_us").select("cnt", "z").as[(Long, Double)].collect()
    val sd = math.sqrt(2.0)
    assert(got.toSeq == Seq(
      (1L, BigDecimal((1 - 2.0) / sd).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (1L, BigDecimal((1 - 2.0) / sd).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (4L, BigDecimal((4 - 2.0) / sd).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("rateAnomaly zero-variance group yields NULL z") {
    val ev = Seq((1L, "a", 1L), (2L, "a", 3600000001L))
      .toDF("event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val z = TimeSeries.rateAnomaly(ev, "event_type", "ts", 3600)
      .select("z").collect()
    assert(z.forall(_.isNullAt(0)))
  }

  // ---- Classifier ----------------------------------------------------

  test("fitPredict separates a linearly separable toy set") {
    val feat = (1 to 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      // feature strongly correlated with the label
      (i.toLong, y, 1.0, if (y > 0.5) 2.0 else -2.0)
    }.toDF("id", "label", "x0", "x1")
    val out = Classifier.fitPredict(feat, Seq("x0", "x1"), steps = 5, lr = 0.5)
    val acc = out.filter((col("pred") === true) === (col("label") > 0.5))
      .count()
    assert(acc == 40L, "all toy rows classified correctly")
  }

  test("fitPredict is deterministic across partitionings") {
    val base = (1 to 100).map { i =>
      (i.toLong, (i % 3 == 0 ^ i % 7 == 0, 1.0, i / 50.0, (i % 11) / 10.0))
    }.map { case (id, (y, x0, x1, x2)) =>
      (id, if (y) 1.0 else 0.0, x0, x1, x2) }
    val a = Classifier.fitPredict(
      base.toDF("id", "label", "x0", "x1", "x2").repartition(1),
      Seq("x0", "x1", "x2"), steps = 3)
    val b = Classifier.fitPredict(
      base.toDF("id", "label", "x0", "x1", "x2").repartition(13),
      Seq("x0", "x1", "x2"), steps = 3)
    val sa = a.orderBy("id").select("score").as[Double].collect().toSeq
    val sb = b.orderBy("id").select("score").as[Double].collect().toSeq
    assert(sa == sb, "integerized gradients make training order-free")
  }

  // ---- survival ------------------------------------------------------

  test("kaplanMeier: risk counts, censoring, exact log-space curve") {
    // durations: 1 (death), 1 (death), 2 (censored), 3 (death)
    val df = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L)).toDF("dur", "obs")
    val got = graft.operators.Survival.kaplanMeier(df, "dur", "obs")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    // t=1: n=4 at risk, 2 events, cost = round(-ln(1-2/4)*1e9) = 693147181
    // t=2: censored only -> no row; t=3: 1 at risk, 1 event = exact zero
    //      survival -> NULL cost skipped, cum stays
    assert(got.toSeq == Seq((1L, 4L, 2L, 693147181L),
      (3L, 1L, 1L, 693147181L)))
  }

  // ---- graph: label propagation + triangles --------------------------

  test("labelPropagation adopts majority labels with min tie-break") {
    // path 1-2-3 mirrored: r1 = (1→2, 2→1 tie-min, 3→2); r2 = (1→1, 2→2, 3→1)
    val fwd = Seq((1L, 2L), (2L, 3L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val r2 = graft.operators.Graph.labelPropagation(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    val r1 = graft.operators.Graph.labelPropagation(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("triangles enumerates each triangle once, canonically sorted") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L))
      .toDF("id_a", "id_b") // duplicate (1,2) in both directions
    val got = graft.operators.Graph.triangles(pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L)))
  }

  test("triangles under a hub: star closes only where an edge exists") {
    val star = (1L to 5L).map(i => (0L, i))
    val pairs = (star :+ (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.operators.Graph.triangles(pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 5L)))
  }

  // ---- streaming anomaly ---------------------------------------------

  test("StreamingAnomaly matches the batch scorer over a full replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(("a", ts(0, 5)), ("a", ts(0, 10)), ("a", ts(1, 5)),
      ("b", ts(0, 30)), ("b", ts(2, 0)), ("b", ts(2, 30)), ("b", ts(2, 45)))
    val batch = rows.toDF("event_type", "ts")
    val baseline = graft.operators.TimeSeries.momentStats(
      graft.operators.TimeSeries.binCounts(batch, "event_type", "ts", 3600))
    val expected = graft.operators.TimeSeries
      .rateAnomaly(batch, "event_type", "ts", 3600)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = graft.streaming.StreamingAnomaly.score(
        mem.toDF().toDF("event_type", "ts"), baseline,
        "event_type", "ts", "1 hour")
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("complete").start()
    mem.addData(rows.take(3)); q.processAllAvailable()
    mem.addData(rows.drop(3)); q.processAllAvailable()
    val got = spark.table("anom_out").collect().map(_.toSeq).toSet
    q.stop()
    assert(got == expected)
  }

  // ---- phrase mining + merge -----------------------------------------

  test("minePhrases scores PMI on exact counts; mergePhrases is greedy") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "new york city new york is big"),
      (2L, "new york has a big city")).toDF("doc_id", "text")
    val mined = TextAnalysis.minePhrases(docs, "text", minCount = 3, topK = 5)
      .select("phrase", "n_ab").as[(String, Long)].collect().toSeq
    assert(mined == Seq(("new york", 3L)))
    val merged = TextAnalysis.mergePhrases(docs, "doc_id", "text",
        Seq("new york", "york city"))
      .orderBy("doc_id").select("merged").as[String].collect().toSeq
    // greedy left-to-right: "new york" wins at position 1, the overlapping
    // "york city" cannot re-match the consumed token
    assert(merged == Seq("new_york city new_york is big",
      "new_york has a big city"))
  }

  test("olsTrend recovers an exact linear relation") {
    import graft.operators.Stats
    // y = 2x + 3 exactly -> slope 2, intercept 3; plus a flat group
    val df = ((0 to 10).map(x => ("up", x.toLong, 2.0 * x + 3)) ++
      (0 to 10).map(x => ("flat", x.toLong, 7.0))).toDF("g", "x", "y")
    val got = Stats.olsTrend(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got("up") == (2.0, 3.0))
    assert(got("flat") == (0.0, 7.0))
  }

  test("corrMatrix: perfect correlation, anti-correlation, and pair count") {
    import graft.operators.Stats
    val df = (1 to 20).map(i => (i.toLong, 3L * i, -2L * i))
      .toDF("a", "b", "c")
    val got = Stats.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"),
        "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.size == 3)
    assert(got(("a", "b")) == 1.0 && got(("a", "c")) == -1.0 &&
      got(("b", "c")) == -1.0)
  }

  test("association rules: support, confidence, and lift are exact") {
    import graft.operators.BasketAnalysis
    // baskets: {x,y} {x,y} {x} {y,z}; s_x=3 s_y=3 s_xy=2, N=4
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (4L, "y"), (4L, "z"), (4L, "z")).toDF("bk", "it")
    val got = BasketAnalysis.rules(df, "bk", "it", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // conf(x=>y) = 2/3 rounded; lift = 4*2/(3*3)
    assert(got(("x", "y")) == (2L, 0.666667, 0.888889))
    assert(got(("y", "x")) == (2L, 0.666667, 0.888889))
    assert(!got.contains(("y", "z")), "support 1 < minSupport")
  }

  test("psiDrift: identical slices score zero; a shifted slice scores high") {
    import graft.operators.FeatureEng
    val same = (1 to 100).flatMap(i =>
      Seq(("g", i % 10 * 10.0 + 1, false), ("g", i % 10 * 10.0 + 1, true)))
      .toDF("grp", "v", "cur")
    val zero = FeatureEng.psiDrift(same, "grp", "v", "cur", 10, 0.0, 100.0)
      .select("psi_micro").as[Long].head()
    assert(zero == 0L, "identical distributions: every (p - q) term is 0")
    val shifted = ((1 to 100).map(i => ("g", 5.0, false)) ++
      (1 to 100).map(i => ("g", 95.0, true)))
      .toDF("grp", "v", "cur")
    val high = FeatureEng.psiDrift(shifted, "grp", "v", "cur", 10, 0.0, 100.0)
      .select("psi_micro").as[Long].head()
    assert(high > 250000L, s"disjoint mass must exceed the 0.25 alarm: $high")
  }

  test("hashFeatures builds a fixed-width count vector, partition-free") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a"), (2L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.hashFeatures(docs, "doc_id", "text", dim = 8)
      .orderBy("id").select("features").as[Seq[Long]].collect()
    assert(out.forall(_.length == 8))
    assert(out(0).sum == 3L && out(0).max == 2L, "counts: a=2, b=1")
    assert(out(1).sum == 1L)
    val repart = TextAnalysis.hashFeatures(docs.repartition(7), "doc_id",
      "text", dim = 8).orderBy("id").select("features")
      .as[Seq[Long]].collect()
    assert(repart.toSeq == out.toSeq)
  }

  // ---- persisted IVF index -------------------------------------------

  test("persisted IVF index reproduces ivfTopK; pruned probe matches") {
    import graft.operators.Similarity
    val emb = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf-test").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nCells = 4)
    val viaIndex = Similarity.queryIvfIndex(spark, dir, emb,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val direct = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nCells = 4, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(viaIndex == direct && viaIndex.nonEmpty)
    val q1 = emb.filter(col("vec_id") === 5)
    val pruned = Similarity.queryIvfIndex(spark, dir, q1,
        "vec_id", "embedding", k = 3, nprobe = 2, pruneCells = true)
      .collect().map(_.toSeq).toSet
    val unpruned = Similarity.queryIvfIndex(spark, dir, q1,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(pruned == unpruned && pruned.nonEmpty)
  }

  // ---- RRF fusion ----------------------------------------------------

  test("rrfFuse combines ranks and keeps one-list-only ids") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val sem = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val got = Ranking.rrfFuse(Seq("lex" -> lex, "sem" -> sem), 60, 10)
      .orderBy("rank")
    val rows = got.select("id", "lex_rank", "sem_rank", "rank")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3)))
    // 10: 1/61+1/62; 20: 1/62+1/61 (tie, id asc); 30: 1/63; 40: 1/63 (tie)
    assert(rows.map(_._1).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(rows(0)._2 == 1L && rows(0)._3 == 2L)
    assert(rows(2)._2 == 3L && rows(2)._3 == null)
    val rrf = got.select("rrf").as[Double].collect()
    assert(rrf(0) == rrf(1) && rrf(0) > rrf(2))
  }
}
