package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, Distribution, Graph, KMeans, Ranking,
  Sketches}
import graft.functions.ZOrderExprs

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  // ---- bloom-pruned join ----------------------------------------------
  test("bloom prune never drops a joining row and does drop non-joiners") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.prune(li, "l_orderkey", dim, "o_orderkey",
      expectedItems = 10000L, numBits = 80000L)
    // exactness: pruned-then-joined == plain join (no false negatives)
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val viaBloom = pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom === plain)
    // effectiveness: the ~20%-selective dim must prune most fact rows
    // (false-positive rate at 8 bits/key is ~3%)
    val total = li.count()
    val kept = pruned.count()
    assert(kept < total * 3 / 10 + total / 20,
      s"bloom kept $kept of $total — no pruning happened")
  }

  // ---- Count-Min sketch ------------------------------------------------
  test("CMS estimates never undercount and merge = rebuild") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val sketch = Sketches.cmsBuild(ev, "user_id")
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(exact, "user_id", sketch)
    assert(est.filter(col("est") < col("n")).count() === 0,
      "CMS must never undercount")
    // mergeability: sketch(A) + sketch(B) == sketch(A union B), counter-wise
    val Array(a, b) = ev.randomSplit(Array(0.5, 0.5), seed = 7)
    val merged = Sketches.cmsBuild(a, "user_id")
      .unionByName(Sketches.cmsBuild(b, "user_id"))
      .groupBy("ri", "bucket").agg(sum("cnt").as("cnt"))
    val rebuilt = Sketches.cmsBuild(a.unionByName(b), "user_id")
    assert(merged.join(rebuilt, Seq("ri", "bucket"))
      .filter(merged("cnt") =!= rebuilt("cnt")).count() === 0)
    assert(merged.count() === rebuilt.count())
  }

  // ---- heavy hitters ---------------------------------------------------
  test("heavy hitters: exact regime matches full groupBy; index merge = direct") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    // distinct event types ≪ maxTracked → counts are exact
    val hh = Sketches.heavyHitters(ev, "event_type", 3, maxTracked = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh === exact)
    // two persisted batch states combined == one-shot over the union
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-test").toString
    val Array(a, b) = ev.randomSplit(Array(0.5, 0.5), seed = 11)
    Sketches.heavyHittersBatch(a, "event_type", dir, maxTracked = 32)
    Sketches.heavyHittersBatch(b, "event_type", dir, maxTracked = 32)
    val merged = Sketches.mergedHeavyHitters(spark, dir, 3, maxTracked = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged === exact)
  }

  test("heavy hitters: estimation regime recalls true heavies on a skewed corpus") {
    import spark.implicits._
    // 5 heavy keys (~2000 hits each) drowned in 20k distinct singletons —
    // cardinality 40× past maxTracked=512, so the sketch must estimate.
    val heavy = spark.range(0, 10000)
      .selectExpr("concat('heavy_', CAST(id % 5 AS STRING)) AS k")
    val noise = spark.range(0, 20000)
      .selectExpr("concat('noise_', CAST(id AS STRING)) AS k")
    val corpus = heavy.unionByName(noise)
    val top = Sketches.heavyHitters(corpus, "k", 5, maxTracked = 512)
      .collect().map(_.getString(0)).toSet
    assert(top === (0 until 5).map(i => s"heavy_$i").toSet,
      s"sketch missed a true heavy hitter: $top")
  }

  // ---- TF-IDF / BM25 ---------------------------------------------------
  test("tf-idf surfaces a repeated rare term over common terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zebra zebra zebra the the of and a common words here"),
      (2L, "the of and a common words here nothing else at all"),
      (3L, "the of and a common words here also nothing special")).toDF("doc_id", "text")
    val top = Ranking.tfIdfTopTerms(docs, "doc_id", "text", 1)
      .filter(col("doc") === 1L).head()
    assert(top.getAs[String]("term") === "zebra")
  }

  test("bm25 ranks the term-dense short doc first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join join other other other other other other other"),
      (2L, "join other other other other other other other other other"),
      (3L, "other other other other other other other other other other"))
      .toDF("doc_id", "text")
    val res = Ranking.bm25TopDocs(docs, "doc_id", "text", Seq("join"), 10)
    val ranked = res.orderBy(col("rank")).select(col("doc")).as[Long].collect()
    assert(ranked.toSeq === Seq(1L, 2L))  // doc 3 has no hit; tf orders 1 > 2
  }

  // ---- Z-order ---------------------------------------------------------
  test("morton interleave matches hand-computed codes") {
    import spark.implicits._
    // morton2(x,y) = x bits in even positions, y in odd:
    // (3,0)->0b0101=5  (0,3)->0b1010=10  (5,5)->0b110011=51  (0,0)->0
    val df = Seq((3L, 0L), (0L, 3L), (5L, 5L), (0L, 0L), (123456L, 654321L))
      .toDF("x", "y")
      .withColumn("z", expr(ZOrderExprs.sparkMorton2("x", "y")))
    val z = df.orderBy("x", "y").select("z").as[Long].collect()
    def ref(x: Long, y: Long): Long = {
      var r = 0L
      for (b <- 0 until 31)
        r |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      r
    }
    assert(z.toSeq === Seq(ref(0, 0), ref(0, 3), ref(3, 0), ref(5, 5),
      ref(123456, 654321)))
    // int32 inputs must spread in 64-bit arithmetic: without the BIGINT
    // seed cast, shiftleft stays 32-bit and values >= 2^15 wrap silently
    val zi = Seq((123456L, 654321L)).toDF("xl", "yl")
      .select(col("xl").cast("int").as("x"), col("yl").cast("int").as("y"))
      .withColumn("z", expr(ZOrderExprs.sparkMorton2("x", "y")))
      .select("z").as[Long].head()
    assert(zi === ref(123456, 654321))
  }

  test("z-order layout skips more files than linear sort on the trailing dim") {
    // 256x256 uniform grid, 16 files: a linear x-sort answers x-ranges but
    // every file spans all of y, so a y-stripe touches ALL files; the
    // z-order layout's files are ~64x64 tiles, so the same stripe touches
    // only the tile rows it crosses — this asymmetry is the whole point of
    // multi-dim clustering
    val grid = spark.range(0, 65536L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear").toString
    Distribution.writeZOrdered(grid, "x", "y", zDir, 16)
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(lDir)
    def touched(dir: String): Long =
      Distribution.fileEnvelopes(spark, dir, Seq("x", "y"))
        .filter(col("min_y") <= 131 && col("max_y") >= 100)
        .count()
    val (zf, lf) = (touched(zDir), touched(lDir))
    assert(lf === 16L, s"linear x-sort should touch every file, got $lf")
    // the stripe crosses 2 of 4 tile rows => ~8 ideal; range-partition
    // boundaries come from sampling whose seed depends on rdd id (session
    // history), so allow boundary smear — the claim is vs lf = 16
    assert(zf <= 12, s"z-order touched $zf of 16 files — no skipping win")
  }

  // ---- plan hygiene ----------------------------------------------------
  test("q50 plan: dim filter pushed to parquet, bloom probe on the fact scan") {
    val plan = SparkEntry.queries("q50_bloom_join")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]"),
      s"dim predicate must reach the parquet scan:\n$plan")
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    assert(plan.contains("partial_bloom_filter_agg"),
      s"bloom build must be a distributed partial aggregate:\n$plan")
  }

  // ---- profiling scale path -------------------------------------------
  test("approx profile matches exact within HLL tolerance") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val cols = Seq("o_orderkey", "o_orderstatus")
    val exact = graft.operators.Profile.summarize(o, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = graft.operators.Profile.summarize(o, cols, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- cols)
      assert(math.abs(approx(c) - exact(c)) <= math.max(2L, exact(c) / 10),
        s"$c: approx ${approx(c)} vs exact ${exact(c)}")
  }

  test("incremental profile: merged sketches are duplicate-insensitive") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-profidx-t").toString
    // OVERLAPPING batches: rows with o_orderkey in [1500, 3000] are
    // sketched twice — the HLL union must not double-count their values
    // (counters DO sum per batch; they assume batches partition the
    // corpus, which append-ingest guarantees)
    val b1 = o.filter(col("o_orderkey") <= 3000)
    val b2 = o.filter(col("o_orderkey") >= 1500)
    graft.operators.Profile.sketchBatch(b1, Seq("o_custkey"), dir)
    graft.operators.Profile.sketchBatch(b2, Seq("o_custkey"), dir)
    val m = graft.operators.Profile.mergedProfile(spark, dir).collect().head
    val exact = o.filter(col("o_orderkey") <= 3000 || col("o_orderkey") >= 1500)
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    val est = m.getAs[Long]("n_distinct_est")
    assert(math.abs(est - exact) <= math.max(2L, exact / 10),
      s"merged estimate $est vs exact $exact")
    assert(m.getAs[Long]("n_nonnull") === b1.count() + b2.count())
  }

  test("incremental profile: merged KLL quantiles track exact ranks; strings stay null") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-profq-t").toString
    val cols = Seq("o_orderkey", "o_totalprice", "o_orderstatus")
    // disjoint halves: quantile counters/sketches assume batches partition
    // the corpus (append-ingest), unlike the distinct union above
    graft.operators.Profile.sketchBatch(
      o.filter(col("o_orderkey") % 2 === 0), cols, dir)
    graft.operators.Profile.sketchBatch(
      o.filter(col("o_orderkey") % 2 === 1), cols, dir)
    val m = graft.operators.Profile.mergedProfile(spark, dir)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // non-numeric column: no KLL sketch, quantiles must be null, the HLL
    // side of the same row still present
    assert(m("o_orderstatus").isNullAt(
      m("o_orderstatus").fieldIndex("p50_est")))
    assert(m("o_orderstatus").getAs[Long]("n_nonnull") > 0)
    // numeric columns: the estimate's exact rank lands within the KLL
    // error band of the target quantile (k=400 -> ~0.9% at 99%; 3% margin)
    val n = o.count().toDouble
    for (c <- Seq("o_orderkey", "o_totalprice"); (q, f) <- Seq(
        (0.5, "p50_est"), (0.95, "p95_est"))) {
      val est = m(c).getAs[Double](f)
      val rank = o.filter(col(c) <= est).count() / n
      assert(math.abs(rank - q) <= 0.03,
        s"$c $f=$est has exact rank $rank, expected ~$q")
    }
  }

  test("incremental profile: mixed KLL types for one column fail loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-profmix-t").toString
    // same column name sketched as bigint in one batch, double in the
    // next (schema widening): merging must raise, not silently report
    // quantiles of only the double batches
    graft.operators.Profile.sketchBatch(
      (1L to 100L).toDF("x"), Seq("x"), dir)
    graft.operators.Profile.sketchBatch(
      (1 to 100).map(_ / 10.0).toDF("x"), Seq("x"), dir)
    val e = intercept[Exception] {
      graft.operators.Profile.mergedProfile(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("mixed KLL")),
      s"expected a mixed-KLL error, got: $e")
  }

  // ---- bounded top-k aggregate ----------------------------------------
  test("TopK aggregate equals the window formulation and plans as an aggregate") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.udaf
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val topk = udaf(graft.functions.TypedAggregators.TopK(5))
    val viaAgg = o.groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
      .select(col("o_orderpriority"), explode(col("tk")).as("item"))
      .select(col("o_orderpriority"), col("item.id"), col("item.key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg === viaWindow)
    // plan shape: partial aggregation (map-side top-k), and NO window/sort
    // over the full input
    val plan = o.groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_topk") || plan.contains("ObjectHashAggregate"),
      s"expected partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"must not plan a window:\n$plan")
  }

  // ---- interval-overlap join ------------------------------------------
  test("bin-join overlap equals the theta join, one row per pair") {
    import spark.implicits._
    val a = Seq((1L, 7L, 0L, 100L), (2L, 7L, 50L, 400L), (3L, 8L, 0L, 10L))
      .toDF("a_id", "a_user", "a_s", "a_e")
    val b = Seq((11L, 7L, 90L, 120L), (12L, 7L, 380L, 390L), (13L, 8L, 11L, 20L),
      (14L, 9L, 0L, 1000L)).toDF("b_id", "b_user", "b_s", "b_e")
    // binWidth 16: several intervals span many bins — the later-start rule
    // must still emit each overlapping pair exactly once
    val got = graft.operators.IntervalJoin.overlap(a, b,
        "a_user", "b_user", "a_s", "a_e", "b_s", "b_e", binWidth = 16L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val want = a.join(b, $"a_user" === $"b_user" &&
        $"b_s" <= $"a_e" && $"a_s" <= $"b_e")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    // (1,11) overlap at 90-100; (2,11) 90-120∩50-400; (2,12) inside;
    // (3,13) touch? 11 > 10 -> no; (14) user 9 never joins
    assert(want === Seq((1L, 11L), (2L, 11L), (2L, 12L)))
  }

  // ---- k-means ---------------------------------------------------------
  test("integer k-means is bit-identical across partitionings and covers all ids") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = KMeans.assign(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vector labeled exactly once, clusters in range
    assert(a.size === emb.count())
    assert(a.values.forall(c => c >= 0 && c < 4))
    assert(a.values.toSet.size > 1, "degenerate single-cluster result")
    // same input shuffled into a different partitioning => same labels
    // (this is the property float centroid means cannot give)
    val b = KMeans.assign(emb.repartition(7), "vec_id", "embedding",
        k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("k-means assignment plans as a hash aggregate, not a window or sort") {
    // the per-round argmin must be a map-side-combinable TRUE hash
    // aggregate: row_number().over(Window.partitionBy(id)) shuffles AND
    // sorts k× the corpus every round, and min_by over a struct ordering
    // silently degrades to SortAggregate (struct is not a mutable buffer
    // type) — same local sort cost (mirror of the q58 top-k plan test)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = KMeans.assignmentRound(emb, "vec_id", "embedding", k = 4)
      .queryExecution.executedPlan.toString
    // everything above the BroadcastExchange is the N×k streamed path; the
    // build side below it ranks the k seed rows (k rows total — a window
    // there is a constant-cost detail, not a scale hazard)
    val streamedPath = plan.split("BroadcastExchange")(0)
    assert(!streamedPath.contains("Window"),
      s"k-means argmin must not plan a window:\n$plan")
    assert(!streamedPath.contains("SortAggregate"),
      s"k-means argmin must not degrade to SortAggregate:\n$plan")
    assert(streamedPath.contains("HashAggregate"),
      s"expected a hash aggregate in the assignment:\n$plan")
  }

  // ---- curation operators: structural invariants -----------------------
  test("packSequences/qualityBand/scrubRareTokens invariants on testdata") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // packing: offsets stay inside the budget; per shard, bins start at 0
    // and are nondecreasing in id order; token mass is conserved
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
      "source", 512).collect()
    assert(packed.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 512))
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byId.head === 0L)
      assert(byId.zip(byId.tail).forall { case (a, b) => a <= b })
    }
    val totalTokens = docs.selectExpr("sum(size(split(text, ' ')))")
      .collect().head.getLong(0)
    assert(packed.map(_.getLong(2)).sum === totalTokens)
    // band: per shard, kept count is within 1 of the band fraction
    val band = TextAnalysis.qualityBand(docs, "doc_id", "text", "source",
      1000, 9000).collect().groupBy(_.getString(0)).view.mapValues(_.length)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    band.foreach { case (src, kept) =>
      val n = perSource(src)
      val expected = (BigInt(9000) * (n - 1) / 10000
        - (BigInt(1000) * (n - 1) + 9999) / 10000 + 1).toLong
      assert(math.abs(kept - expected) <= 1, s"$src kept=$kept n=$n")
    }
    // scrub: every surviving token's document frequency meets the floor,
    // and no doc row is dropped
    val scrubbed = TextAnalysis.scrubRareTokens(docs, "doc_id", "text", 3)
    assert(scrubbed.count() === docs.count())
    val survivors = scrubbed
      .selectExpr("explode(filter(split(scrubbed_text, ' '), w -> w <> '')) AS w",
        "doc_id")
      .distinct()
      .groupBy("w").count()
    val orig = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS w")
      .distinct().groupBy("w").count()
      .withColumnsRenamed(Map("count" -> "df"))
    val bad = survivors.join(orig, "w").filter(col("df") < 3).count()
    assert(bad === 0)
  }

  test("scrubBoilerplateSpans drops hot spans, keeps order, passes short docs") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // "a b" appears in 4 docs (> maxDf 2) -> hot; "b c" in only 2 -> kept
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "a b x y"),
      (4L, "q a b"),
      (5L, "a b a b a"), // overlapping hot occurrences: only pos 5 survives
      (6L, "z"),         // shorter than spanLen: untouched
      (7L, "a b")        // fully covered -> empty string
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateSpans(docs, "doc_id", "text",
        spanLen = 2, maxDf = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "c d", 2L -> "c e", 3L -> "x y", 4L -> "q",
      5L -> "a", 6L -> "z", 7L -> ""))
  }

  test("groupSplit: groups are atomic, split is partitioning-invariant") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = TextAnalysis.groupSplit(docs, "source", 800)
      .select("source", "split")
    // group atomicity: each source maps to exactly one side
    val sides = split.distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(sides.values.forall(_.size == 1), "a group straddles the split")
    // non-degenerate at this threshold on this corpus
    val bySide = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.keySet === Set("train", "eval"))
    // determinism under repartitioning: identical assignment per doc
    val a = TextAnalysis.groupSplit(docs, "source", 800)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.groupSplit(docs.repartition(7), "source", 800)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // boundary thresholds degenerate cleanly — including NULL group keys,
    // which form one ordinary group rather than silently landing in eval
    val withNulls = docs.withColumn("source",
      when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("source")))
    assert(TextAnalysis.groupSplit(withNulls, "source", 1000)
      .filter(col("split") === "eval").count() === 0L)
    assert(TextAnalysis.groupSplit(withNulls, "source", 0)
      .filter(col("split") === "train").count() === 0L)
  }

  // ---- PageRank --------------------------------------------------------
  test("integer pagerank: 2-cycle stays uniform, star concentrates rank") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(cycle, 3).orderBy("id")
      .select("rank").as[Long].collect()
    // uniform fixpoint: both nodes keep exactly scale/N units
    // (teleport + 85% of unit = unit, up to the two integer divisions)
    assert(r.length === 2 && r(0) === r(1))
    assert(math.abs(r(0) - 500000000000L) < 5L)

    // hub-and-spoke (bidirectional): hub must out-rank every leaf
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("src", "dst")
    val both = star.unionByName(star.select(col("dst").as("src"), col("src").as("dst")))
    val ranks = Graph.pageRank(both, 3).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(l => ranks(9L) > ranks(l)))
    // mass conservation: within integer-division slack of total scale
    assert(math.abs(ranks.values.sum - 1000000000000L) < 100L)
  }

  test("pagerank dangling mass: sink rank redistributes, arithmetic exact") {
    import spark.implicits._
    // 1 -> 2 with 2 a sink. Hand-computed round (scale 1e12, N=2):
    //   unit = 5e11, tp = (15 * 5e11) // 100 = 75e9
    //   r1(1) = tp + 85*(0        + dm//2) // 100   with dm = r0(2) = unit
    //   r1(2) = tp + 85*(r0(1)//1 + dm//2) // 100
    val sink = Seq((1L, 2L)).toDF("src", "dst")
    val one = Graph.pageRank(sink, 1, edgesDistinct = true,
        danglingMass = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unit = 1000000000000L / 2
    val tp = (100L - 85L) * unit / 100L
    assert(one(1L) === tp + 85L * (unit / 2) / 100L)
    assert(one(2L) === tp + 85L * (unit + unit / 2) / 100L)
    // without the flag this graph is out of contract (node 2 has no
    // out-edge and silently vanishes from the node set)
    val without = Graph.pageRank(sink, 1, edgesDistinct = true)
      .select("id").as[Long].collect().toSet
    assert(without === Set(1L))
    // partitioning invariance (the integer-exactness property)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val edges = li.select(col("l_partkey").cast("long").as("src"),
      (col("l_suppkey").cast("long") + 10000000L).as("dst")).distinct()
    val a = Graph.pageRank(edges, 2, edgesDistinct = true,
        danglingMass = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(edges.repartition(7), 2, edgesDistinct = true,
        broadcastRank = true, danglingMass = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // sinks hold real rank: suppliers (only ever destinations) must all
    // out-rank the teleport floor
    val tpFloor = (100L - 85L) * (1000000000000L / a.size) / 100L
    assert(a.filter(_._1 >= 10000000L).values.forall(_ > tpFloor))
  }

  test("bucketed edges: per-round pagerank plan has no exchange above the edge scan") {
    // the Graph doc claims a src-bucketed edge table eliminates the edge
    // shuffle entirely (not just amortizes it behind a cache) — prove it on
    // the per-round contributions plan. Broadcast is disabled so the
    // rank join takes the SMJ path it would at cluster scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val fwd = li.select(col("l_partkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst")).distinct()
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      Distribution.writeBucketed(edges, "edges_pr", Seq("src"), 4)
      val scan = spark.table("edges_pr")
      val e = Graph.withDegrees(scan, broadcastDegrees = true)
      val rank = scan.select(col("src").as("id")).distinct()
        .select(col("id"), lit(1000000L).as("rank"))
      val plan = Graph.contributions(e, rank)
        .queryExecution.executedPlan.toString()
      // the edge side must ride the bucketing: hash exchanges are allowed
      // only for the rank frame (co-partition with the buckets) and the
      // final per-destination aggregate — never over the bucketed scan
      assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(src"),
        s"edge side must not shuffle:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 2,
        s"expected at most rank + dst-agg exchanges, got $exchanges:\n$plan")
      // and the bucketed loop returns exactly the repartition path's ranks
      val viaBucketed = Graph.pageRank(scan, 2,
          edgesDistinct = true, prePartitioned = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaPlain = Graph.pageRank(edges, 2, edgesDistinct = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBucketed === viaPlain)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  // ---- exact-substring dedup spans -------------------------------------
  test("exactDupSpans: hand extents, island merge, and hot-gram boundedness") {
    import spark.implicits._
    import graft.operators.Dedup
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // A and B share a verbatim 12-token run; C is all-unique; D repeats its
    // own 10-token sentence twice (same-doc duplication must count)
    val shared = words(12, "s")
    val selfRep = words(10, "r")
    val docs = Seq(
      (1L, s"${words(5, "a")} $shared ${words(4, "az")}"),
      (2L, s"$shared ${words(6, "b")}"),
      (3L, words(30, "c")),
      (4L, s"$selfRep ${words(3, "d")} $selfRep")).toDF("doc_id", "text")
    val spans = Dedup.exactDupSpans(docs, "doc_id", "text", minTokens = 8)
    val got = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans.unpersist()
    // doc 1: tokens 5..16 duplicated -> span [5, 17); doc 2: [0, 12)
    assert(got.contains((1L, 5L, 17L)), s"doc1 span missing from $got")
    assert(got.contains((2L, 0L, 12L)), s"doc2 span missing from $got")
    // doc 3 clean; doc 4 flagged (both copies of its repeated sentence)
    assert(!got.exists(_._1 == 3L), "unique doc must not be flagged")
    assert(got.count(_._1 == 4L) === 2, s"self-repeat spans in $got")
    // boundedness: a boilerplate 8-gram present in EVERY doc of a corpus
    // must cost its occurrence count, not C(occ, 2) — output rows stay
    // <= total duplicated positions (the 1:1 frequency join never pairs)
    val boiler = words(8, "x")
    val hot = (0 until 400).map(i =>
      (i.toLong, s"$boiler ${words(6, s"u$i")}")).toDF("doc_id", "text")
    val hotSpans = Dedup.exactDupSpans(hot, "doc_id", "text", minTokens = 8)
    val n = hotSpans.count()
    hotSpans.unpersist()
    assert(n === 400L, s"one span per doc expected, got $n")
  }
}
