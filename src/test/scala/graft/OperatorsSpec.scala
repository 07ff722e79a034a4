package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Similarity}

/** Operator semantics + LSH quality, measured against brute force on the
  * sf0.001 testdata. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def docs = spark.read.parquet(s"$sf/documents.parquet")
  def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("containment catches subset duplication jaccard misses") {
    import spark.implicits._
    // doc 1 is quoted verbatim at the head of the much longer doc 2:
    // every doc-1 shingle appears in doc 2, so containment is 1.0, while
    // Jaccard is diluted by doc 2's size to well under 0.7
    val pair = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " +
        "n1 n2 n3 n4 n5 n6 n7 n8")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(pair, "doc_id", "text", 8, 10)
    assert(cont.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    cont.unpersist()
    val jac = Dedup.ngramNearDups(pair, "doc_id", "text", 7, 10)
    assert(jac.count() === 0)
    jac.unpersist()
  }

  test("as-of join picks latest right row at-or-before left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 5L), (3L, 20L)).toDF("id", "ts")
    val right = Seq((100L, 10L, "a"), (100L, 15L, "b")).toDF("k", "ts", "v")
      .withColumnRenamed("ts", "rts")
    val l = left.withColumn("k", lit(100L))
    val out = AsOfJoin.joinBackward(l, right,
      Seq("k"), Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a")   // ts=10 matches rts=10 (>= semantics)
    assert(out(2L) === null)  // nothing at-or-before ts=5
    assert(out(3L) === "b")   // latest at-or-before 20 is 15
  }

  test("incremental dedup over batches equals one-shot minhash dedup") {
    val full = Dedup.minhashNearDups(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("inc-test").toString
    // three uneven batches; each output must only involve its own batch
    val cuts = Seq(
      docs.filter(col("doc_id") < 100),
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 180),
      docs.filter(col("doc_id") >= 180))
    val incremental = cuts.flatMap(b =>
      graft.operators.IncrementalDedup.processBatch(b, "doc_id", "text", dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))).toSet
    assert(incremental === full)
    // the index accumulated all three batches
    assert(spark.read.parquet(s"$dir/shingles").count() === docs.count())
  }

  test("as-of tolerance nulls out matches beyond the lookback window") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 100L), (3L, 16L)).toDF("id", "ts")
      .withColumn("k", lit(100L))
    val right = Seq((100L, 10L, "a"), (100L, 15L, "b")).toDF("k", "ts", "v")
      .withColumnRenamed("ts", "rts")
    val out = AsOfJoin.joinBackward(left, right,
      Seq("k"), Seq("k"), "ts", "rts", Seq("v"), tolerance = Some(5L))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a")   // distance 0 <= 5
    assert(out(2L) === null)  // latest match (rts=15) is 85 away: nulled
    assert(out(3L) === "b")   // distance 1 <= 5
    // unbounded behaves as before
    val unb = AsOfJoin.joinBackward(left, right,
      Seq("k"), Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(unb(2L) === "b")
  }

  test("minhash LSH finds every near-dup pair the brute-force oracle finds") {
    val brute = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain near-dups")
    // verification step makes LSH ⊆ brute; recall is the real metric
    assert(lsh.subsetOf(brute))
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.9, s"LSH recall $recall (found ${lsh.size}/${brute.size})")
  }

  test("xxhash64 minhash candidates also cover the brute-force pairs") {
    val brute = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidatesXx(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(cand.contains).toDouble / brute.size
    assert(recall >= 0.9, s"xx candidate recall $recall")
  }

  test("stop-shingle cap MISSES clusters larger than the cap (documented mode)") {
    import spark.implicits._
    // 12 near-identical docs: every shared shingle has df = 12 > cap = 10,
    // so cap-on candidate generation finds NOTHING — the documented
    // missed-cluster failure mode that keeps the cap opt-in (route such
    // corpora through exact/minhash dedup first)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (0L until 12L).map(i => (i, s"$text word$i")).toDF("doc_id", "text")
    val capped = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10,
      maxShingleDf = Some(10)).count()
    val exact = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10,
      maxShingleDf = None).count()
    assert(capped === 0L, "cap-on must miss the over-cap cluster entirely")
    assert(exact === 66L, "exact path must emit all C(12,2) pairs")
  }

  test("stop-shingle cap changes no answers: capped output = uncapped output") {
    // scale cap (1000) vs exact-count default on the real corpus: the cap
    // prunes candidate generation only, verification is exact, so outputs
    // must be identical when every true pair shares >= 1 sub-cap shingle
    val capped = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10, maxShingleDf = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramNearDups(docs, "doc_id", "text", 7, 10, maxShingleDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("aggressive stop-shingle cap keeps recall while pruning universal shingles") {
    import spark.implicits._
    // every doc shares one universal sentence (df = 12 > cap = 2); docs 1/2
    // are near-identical beyond it. With cap=2 the universal shingles are
    // pruned from candidates, yet (1,2) still pairs through its rare
    // shingles and is scored by FULL-array Jaccard.
    val common = "shared boilerplate header repeated on every single document in this corpus"
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"
    val rows = Seq(
      (1L, s"$common $base oscar papa"),
      (2L, s"$common $base oscar quebec")) ++
      (3L to 12L).map(i => (i, s"$common unique$i word$i token$i extra$i more$i filler$i"))
    val df = rows.toDF("doc_id", "text")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairSet(Dedup.ngramNearDups(df, "doc_id", "text", 1, 2, maxShingleDf = Some(2)))
    val exact = pairSet(Dedup.ngramNearDups(df, "doc_id", "text", 1, 2, maxShingleDf = None))
    assert(exact.contains((1L, 2L)))
    assert(capped === exact, "cap-on output must cover every true near-dup pair")
  }

  test("containment cap changes no answers on the real corpus") {
    // mirror of the ngram cap contract: candidates from sub-cap shingles
    // only, containment verified against FULL shingle arrays — so with a
    // generous cap the output (including shared_shingles scores) must be
    // byte-identical to the exact kernel
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = rows(Dedup.containmentPairs(docs, "doc_id", "text", 8, 10,
      maxShingleDf = Some(1000)))
    val exact = rows(Dedup.containmentPairs(docs, "doc_id", "text", 8, 10,
      maxShingleDf = None))
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("containment cap misses the all-hot-shingle cluster (documented mode)") {
    import spark.implicits._
    // the short doc quoted in every long doc: all of its shingles have
    // df = 12 > cap = 10, so cap-on candidate generation finds nothing —
    // containment's version of the documented missed-cluster caveat
    val quoted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = ((0L until 11L).map(i =>
      (i, s"$quoted tail$i extra$i more$i word$i filler$i pad$i end$i")) :+
      (11L, quoted)).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df, "doc_id", "text", 8, 10,
      maxShingleDf = Some(10)).count()
    val exact = Dedup.containmentPairs(df, "doc_id", "text", 8, 10,
      maxShingleDf = None).count()
    assert(exact >= 11L, "doc 11 is contained in every other doc")
    assert(capped === 0L, "cap-on must miss the over-cap containment cluster")
  }

  test("simhash: exact duplicates collide, fingerprints discriminate") {
    import spark.implicits._
    val fps = Dedup.simhashFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.values.toSet.size > 50, "fingerprints should spread")
    // duplicate the corpus under shifted ids: every (id, id+100000) pair has
    // identical text => identical simhash and token set => must be found
    val dup = docs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val pairs = Dedup.simhashNearDups(docs.select("doc_id", "text").unionByName(dup),
        "doc_id", "text", 0, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = docs.count()
    val selfPairs = pairs.count { case (a, b) => b == a + 100000 }
    assert(selfPairs === nDocs)
  }

  test("rp-lsh ANN: multi-table raises recall vs single table") {
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recallOf(tables: Int): Double = {
      val lsh = Similarity.rpLshTopK(emb, "vec_id", "embedding", 3, 4, 64, tables)
        .filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      brute.count { case (q, n) => lsh.get(q).contains(n) }.toDouble / brute.size
    }
    val r1 = recallOf(1); val r3 = recallOf(3)
    assert(r3 > r1, s"multi-table recall $r3 should beat single-table $r1")
    assert(r3 >= 0.35, s"3-table rank-1 recall $r3")
  }

  test("native hash expressions match the HOF SQL formulations bit-for-bit") {
    import graft.functions.{HashExprs, HashNative}
    val whNative = docs.select(col("doc_id"),
      HashNative.wordHashes(col("text")).as("x"))
    val whHof = docs.select(col("doc_id"),
      expr(HashExprs.sparkWordHashes("text")).as("x"))
    assert(whNative.except(whHof).count() === 0)
    assert(whHof.except(whNative).count() === 0)

    val base = docs.select(col("doc_id"),
      expr(HashExprs.sparkWordHashes("text")).as("wh"))
      .select(col("doc_id"), expr(HashExprs.sparkShingles("wh")).as("sh"))
    val shNative = docs.select(col("doc_id"),
      HashNative.shingleHashes(HashNative.wordHashes(col("text"))).as("sh"))
    assert(shNative.except(base).count() === 0)

    val sigHof = base.select(col("doc_id"), expr(HashExprs.sparkMinhash("sh")).as("x"))
    val sigNative = shNative.select(col("doc_id"), HashNative.minhashSig(col("sh")).as("x"))
    assert(sigNative.except(sigHof).count() === 0)

    val simHof = base.select(col("doc_id"), expr(HashExprs.sparkSimhash("sh")).as("x"))
    val simNative = shNative.select(col("doc_id"), HashNative.simhash(col("sh")).as("x"))
    assert(simNative.except(simHof).count() === 0)
  }

  test("ivf ANN: more probes raise rank-1 recall") {
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recallOf(nprobe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 8, nprobe)
        .filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      brute.count { case (q, n) => ivf.get(q).contains(n) }.toDouble / brute.size
    }
    val r1 = recallOf(1); val r3 = recallOf(3)
    assert(r3 >= r1, s"nprobe=3 recall $r3 should not trail nprobe=1 $r1")
    assert(r3 >= 0.3, s"nprobe=3 rank-1 recall $r3")
  }

  test("ivf index append: build(A)+append(B) answers == one-shot build(A∪B)") {
    val dirA = java.nio.file.Files.createTempDirectory("ivf-app-a").toString
    val dirU = java.nio.file.Files.createTempDirectory("ivf-app-u").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 200), "vec_id",
      "embedding", dirA, nCells = 8)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 200), "vec_id",
      "embedding", dirA)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dirU, nCells = 8)
    def answers(dir: String) =
      Similarity.queryIvfIndex(spark, dir, emb.filter(col("vec_id") < 30),
        "vec_id", "embedding", 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(answers(dirA) === answers(dirU))
  }

  test("pq index: query == in-session pqTopK; append == pinned-train rebuild") {
    val dirF = java.nio.file.Files.createTempDirectory("pq-full").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", dirF)
    val q = emb.filter(col("vec_id") < 30)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // parity: querying a corpus against its own fresh index reproduces
    // the in-session PQ scorer exactly (same codebooks, same ADC tail)
    val viaIndex = rows(Similarity.queryPqIndex(spark, dirF, q,
      "vec_id", "embedding", 3))
    val inSession = Similarity.pqTopK(q, emb, "vec_id", "embedding", 3)
    assert(viaIndex === rows(inSession))
    inSession.unpersist()
    // append≡rebuild: frozen codebooks are the quantizer contract — the
    // rebuild must train on the ORIGINAL slice to reproduce them
    val dirA = java.nio.file.Files.createTempDirectory("pq-app-a").toString
    val dirU = java.nio.file.Files.createTempDirectory("pq-app-u").toString
    val slice = emb.filter(col("vec_id") < 200)
    Similarity.buildPqIndex(slice, "vec_id", "embedding", dirA)
    Similarity.appendPqIndex(emb.filter(col("vec_id") >= 200), "vec_id",
      "embedding", dirA)
    Similarity.buildPqIndex(emb, "vec_id", "embedding", dirU,
      trainOn = slice)
    def answers(dir: String) = rows(Similarity.queryPqIndex(spark, dir, q,
      "vec_id", "embedding", 3))
    assert(answers(dirA) === answers(dirU))
  }

  test("opq index: recall@10 >= plain PQ on correlated dims; build is bit-deterministic") {
    import spark.implicits._
    // correlated fixture — the regime OPQ exists for (Ge et al. §1:
    // structured descriptors whose correlated dims STRADDLE the naive
    // block boundaries): 8 equal-scale latents, latent k loading a
    // triangular profile on the 8 dims centered on the block-k/k+1
    // boundary (disjoint bands, wrap at 64), plus small independent
    // noise. Each naive block then sees the halves of TWO latents —
    // 16 codes over a 2-D correlated slice (~4 levels per direction) —
    // while the learned rotation concentrates each latent into one
    // coordinate and round-robin hands each block exactly one strong
    // direction: 16 codes on ~1-D (16 levels). Deterministic (no RNG).
    val dim = 64; val nVec = 400
    def frac(seed: Long): Double = {
      // splitmix64 finalizer: a LINEAR hash (seed*c mod p) makes every
      // latent a linear function of id - near-perfectly correlated
      var x = seed + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val profile = Array(1.0, 2.0, 3.0, 4.0, 4.0, 3.0, 2.0, 1.0)
    val fixture = (0 until nVec).map { id =>
      val z = Array.tabulate(8)(k => frac(id * 31L + k * 977L) * 2.0)
      val v = Array.tabulate(dim) { d =>
        val load = (0 until 8).map { k =>
          val off = ((d - (8 * k + 4)) % dim + dim) % dim
          if (off < 8) profile(off) / 4.0 * z(k) * (1.0 - 0.05 * k)
          else 0.0
        }.sum
        (load + 0.05 * frac(id * 64L + d + 977L)).toFloat
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = fixture.filter(col("vec_id") < 25)
    val truth = Similarity.bruteForceTopK(queries, fixture, "vec_id",
        "embedding", 10, broadcastCorpus = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dirP = java.nio.file.Files.createTempDirectory("opq-plain").toString
    val dirO = java.nio.file.Files.createTempDirectory("opq-rot").toString
    Similarity.buildPqIndex(fixture, "vec_id", "embedding", dirP)
    Similarity.buildOpqIndex(fixture, "vec_id", "embedding", dirO)
    def recall(hits: Set[(Long, Long)]): Double =
      truth.count(hits.contains).toDouble / truth.size
    val pqR = recall(Similarity.queryPqIndex(spark, dirP, queries,
      "vec_id", "embedding", 10).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val opqR = recall(Similarity.queryOpqIndex(spark, dirO, queries,
      "vec_id", "embedding", 10).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(opqR >= pqR,
      s"OPQ recall@10 $opqR should be >= plain PQ $pqR on correlated dims")
    assert(opqR > 0.5, s"OPQ recall@10 $opqR implausibly low")
    // learned rows are grid-unit and near-orthogonal (top 8 checked: the
    // strong-eigenvalue components power iteration converges hardest on)
    val rot = Similarity.opqRotation(fixture, "embedding", dim)
    for (k <- 0 until 8) {
      val nk = math.sqrt(rot(k).map(x => x * x).sum.toDouble)
      assert(math.abs(nk / 1e6 - 1.0) < 0.01, s"row $k norm $nk off-unit")
      for (l <- 0 until k) {
        val nl = math.sqrt(rot(l).map(x => x * x).sum.toDouble)
        val cos = rot(k).zip(rot(l)).map { case (a, b) =>
          a.toDouble * b }.sum / (nk * nl)
        assert(math.abs(cos) < 0.05, s"rows $l,$k not orthogonal: $cos")
      }
    }
    // bit-determinism: rebuilding under a different physical partitioning
    // reproduces rotation and codes byte-for-byte (integer sums are
    // partition-order-free; everything downstream is driver BigInt)
    val dirO2 = java.nio.file.Files.createTempDirectory("opq-rot2").toString
    Similarity.buildOpqIndex(fixture.repartition(7), "vec_id", "embedding",
      dirO2)
    def slurp(dir: String, part: String) =
      spark.read.parquet(s"$dir/$part").collect().map(_.toString).toSet
    assert(slurp(dirO, "rotation") === slurp(dirO2, "rotation"))
    assert(slurp(dirO, "codes") === slurp(dirO2, "codes"))
  }

  test("diverseSample: per-cluster quota holds and selection is partitioning-invariant") {
    import graft.operators.Sampling
    val s1 = Sampling.diverseSample(emb, "vec_id", "embedding", 8, 2, 5)
    val picked = s1.collect().map(r => (r.getLong(0), r.getLong(1)))
    s1.unpersist()
    assert(picked.groupBy(_._2).values.forall(_.length <= 5))
    assert(picked.map(_._2).distinct.length === 8, "every cluster represented")
    val s2 = Sampling.diverseSample(emb.repartition(7), "vec_id",
      "embedding", 8, 2, 5)
    val again = s2.collect().map(r => (r.getLong(0), r.getLong(1)))
    s2.unpersist()
    assert(picked.toSet === again.toSet)
  }

  test("trained IVF quantizer: clustered-corpus recall >= rank seeds") {
    import spark.implicits._
    // clustered fixture — the shape real embeddings take and the one where
    // arbitrary-row (rank) seeding skews cell populations: 8 well-separated
    // centers, 40 members each, cluster assignment hash-scrambled across
    // ids so the 8 smallest ids cover an arbitrary (possibly duplicated)
    // subset of clusters, deterministic noise
    val dim = 16
    val rows = (0 until 320).map { i =>
      val c = ((i * 2654435761L) % 8).toInt
      val vec = Array.tabulate(dim) { d =>
        val center = if (d % 8 == c) 1.0f else 0.0f
        center + (((i * 31 + d * 7 + 3) % 13) - 6) / 100.0f
      }
      (i.toLong, vec)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(cdf, cdf, "vec_id", "embedding", 5,
      broadcastCorpus = true).select("query_id", "neighbor_id")
    val nExact = exact.count()
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val hit = exact.join(ann.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      ann.unpersist()
      hit.toDouble / nExact
    }
    val rRank = recallOf(Similarity.ivfTopK(cdf, "vec_id", "embedding", 5,
      nCells = 8, nprobe = 2))
    val rTrained = recallOf(Similarity.ivfTopK(cdf, "vec_id", "embedding", 5,
      nCells = 8, nprobe = 2, trainedSeeds = true))
    assert(rTrained >= rRank,
      s"trained quantizer recall $rTrained must not trail rank seeds $rRank")
    assert(rTrained >= 0.5, s"trained quantizer recall@5 = $rTrained")
    // determinism: a second run is bit-identical
    val again = recallOf(Similarity.ivfTopK(cdf, "vec_id", "embedding", 5,
      nCells = 8, nprobe = 2, trainedSeeds = true))
    assert(again === rTrained)
  }

  test("product quantization: ADC + exact re-rank recovers exact neighbors") {
    // every 10th vector queries the full corpus; candidates = 100 of 500.
    // Fully deterministic (integer k-means codebooks, integer ADC, id
    // tie-breaks): measured recall is 0.82 on this corpus — the floor
    // leaves margin only for platform drift, not run-to-run noise
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    val rr = Similarity.pqRerankTopK(queries, emb, "vec_id", "embedding", 10,
      candidates = 100)
    val hit = exact.join(rr.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id")).count()
    val recall = hit.toDouble / exact.count()
    // structural invariants: k rows per query, dense ranks from 1, no self
    val byQuery = rr.collect().groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.length == 10))
    assert(byQuery.values.forall(
      _.map(_.getLong(2)).sorted.sameElements(1L to 10L)))
    assert(rr.filter(col("query_id") === col("neighbor_id")).count() === 0)
    rr.unpersist()
    assert(recall >= 0.75, s"PQ rerank recall@10 = $recall")
    // empty corpus: a diagnosable error, not a bare NPE from the dim probe
    val err = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, emb.limit(0), "vec_id", "embedding", 3)
    }
    assert(err.getMessage.contains("empty"))
  }

  test("ivf x pq: composed index matches pq-rerank recall on a fraction of rows") {
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val nQ = queries.count()
    val nC = emb.count()
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val hit = exact.join(ann.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      val r = hit.toDouble / exact.count()
      ann.unpersist(); r
    }
    val rPq = recallOf(Similarity.pqRerankTopK(queries, emb, "vec_id",
      "embedding", 10, candidates = 100))
    // nprobe=6 of 8 cells: recall must hold within 0.05 of the full-scan
    // PQ path while scoring only the probed cells' codes
    val rIvfPq = recallOf(Similarity.ivfPqRerankTopK(queries, emb, "vec_id",
      "embedding", 10, candidates = 100, nCells = 8, nprobe = 6))
    assert(rIvfPq >= rPq - 0.05,
      s"ivfpq recall@10 $rIvfPq trails pq rerank $rPq by > 0.05")
    // the sim_ivfpq query entry's recall floor, asserted here per round
    // now that the benched entry runs the ANN path alone (round 9): the
    // sample-trained composed index must clear 0.75 absolute recall
    val rQueryParams = recallOf(Similarity.ivfPqRerankTopK(queries, emb,
      "vec_id", "embedding", 10, candidates = 100, nCells = 8, nprobe = 6,
      trainMaxRows = 1000L))
    assert(rQueryParams >= 0.75,
      s"sim_ivfpq-parameter recall@10 $rQueryParams < 0.75")
    // measured scored-row fraction: k >= |corpus| keeps EVERY candidate
    // (query, vector) pair in the output, so the row count IS the number
    // of ADC-scored pairs — must be the probed fraction, not a full scan
    val cand = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
      nC.toInt, nCells = 8, nprobe = 2)
    val scored = cand.count(); cand.unpersist()
    val fullScan = nQ * (nC - 1)
    assert(scored < 0.6 * fullScan,
      s"ivfpq nprobe=2/8 scored $scored of $fullScan pairs — not pruning")
    assert(scored > 0, "pruning must not drop everything")
  }

  test("pq sample-trained codebooks hold recall; sample is deterministic") {
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val hit = exact.join(ann.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      val r = hit.toDouble / exact.count()
      ann.unpersist(); r
    }
    val rFull = recallOf(Similarity.pqRerankTopK(queries, emb, "vec_id",
      "embedding", 10, candidates = 100))
    // train on a ~40% content-hash sample of the corpus, assign all rows:
    // the Lloyd rounds see only the sample, recall stays within tolerance
    val sampled = Similarity.pqRerankTopK(queries, emb, "vec_id",
      "embedding", 10, candidates = 100, trainMaxRows = 200L)
    val s1 = sampled.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sampled.unpersist()
    val rSampled = recallOf(Similarity.pqRerankTopK(queries, emb, "vec_id",
      "embedding", 10, candidates = 100, trainMaxRows = 200L))
    assert(rSampled >= rFull - 0.1,
      s"sample-trained recall@10 $rSampled trails full training $rFull by > 0.1")
    // deterministic: the hash sample ignores partitioning, so two runs
    // (including one over a differently-partitioned corpus) agree exactly
    val rep = Similarity.pqRerankTopK(queries, emb.repartition(7), "vec_id",
      "embedding", 10, candidates = 100, trainMaxRows = 200L)
    val s2 = rep.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    rep.unpersist()
    assert(s1 === s2)
  }

  test("ivf seeding is rank-based: sparse ids get the full seed set") {
    // ids shifted to a sparse domain (id*1000+7): the old `id < nCells`
    // filter would find a single seed (7) and degenerate to one cell; rank
    // seeding must produce structurally identical results under the mapping
    val dense = Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sparse = emb.select((col("vec_id") * 1000 + 7).as("vec_id"), col("embedding"))
    val sp = Similarity.ivfTopK(sparse, "vec_id", "embedding", 3, 8, 2)
      .collect().map(r => ((r.getLong(0) - 7) / 1000, (r.getLong(1) - 7) / 1000,
        r.getLong(2))).toSet
    assert(dense.nonEmpty)
    assert(sp === dense)
  }

  test("blocked cosine all-pairs equals a naive theta-join computation") {
    import graft.functions.VecDot.vecDot
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"))
    val naive = e.select(col("id").as("id_a"), col("v").as("qv"), col("nrm").as("qn"))
      .join(e.select(col("id").as("id_b"), col("v").as("cv"), col("nrm").as("cn")),
        col("id_a") < col("id_b"))
      .filter(round(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4) >= 0.4)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(blocked.length === blocked.toSet.size, "no duplicate pairs")
    assert(blocked.toSet === naive)
  }

  test("LSH near-dup pairs: precision 1 (subset of exact), recall >= 0.9") {
    // oracle-threshold regime (0.45) — this corpus's qualifying pairs sit
    // AT the threshold, the hardest case for RP-LSH, so the banding is
    // explicit (2 planes x 8 tables, the dedup_embed_lsh query's params)
    val exact = Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshDf = Similarity.cosineNearDupsLsh(emb, "vec_id", "embedding",
      0.45, numPlanes = 2, tables = 8)
    val lsh = lshDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    lshDf.unpersist()
    assert(lsh.length === lsh.toSet.size, "no duplicate pairs")
    assert(lsh.toSet.subsetOf(exact),
      "exact verification must make every emitted pair a true pair")
    assert(exact.nonEmpty)
    assert(lsh.length >= 0.9 * exact.size,
      s"recall ${lsh.length.toDouble / exact.size} < 0.9 " +
        s"(${lsh.length}/${exact.size})")
    // auto-sized planes keep the operator usable with defaults: still a
    // strict subset with no false positives (recall depends on banding)
    val auto = Similarity.cosineNearDupsLsh(emb, "vec_id", "embedding", 0.45)
    val autoPairs = auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    auto.unpersist()
    assert(autoPairs.subsetOf(exact))
  }

  test("LSH clustering refines the exact clustering with bounded splits") {
    // dedup_embed_clusters_lsh's structural invariants, moved out of the
    // benched entry (round 9): LSH pairs ⊆ exact pairs, so every LSH
    // cluster must sit inside exactly one exact cluster (refinement), and
    // missing edges can only SPLIT clusters — bounded at 2% of the corpus
    import graft.operators.Dedup
    val nodes = emb.select(col("vec_id").as("id"))
    val lshCl = Dedup.connectedComponents(nodes,
      Similarity.cosineNearDupsLsh(emb, "vec_id", "embedding", 0.45,
        numPlanes = 2, tables = 8))
    val exCl = Dedup.connectedComponents(nodes,
      Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.45))
    val labels = lshCl.select(col("id"), col("cluster").as("lc"))
      .join(exCl.select(col("id"), col("cluster").as("ec")), Seq("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    lshCl.unpersist(); exCl.unpersist()
    val n = labels.length
    assert(n > 0)
    val lcToEc = labels.toSet
    assert(lcToEc.size === labels.map(_._1).toSet.size,
      "refinement violated: an LSH cluster spans two exact clusters")
    val splits = labels.map(_._1).toSet.size - labels.map(_._2).toSet.size
    assert(splits <= math.max(1.0, n * 0.02),
      s"$splits split clusters over $n vectors exceeds the 2% bound")
  }

  test("forward as-of join picks earliest right row at-or-after left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 16L), (3L, 20L)).toDF("id", "ts")
      .withColumn("k", lit(100L))
    val right = Seq((100L, 10L, "a"), (100L, 15L, "b")).toDF("k", "rts", "v")
    val out = AsOfJoin.joinForward(left, right,
      Seq("k"), Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a")   // ts=10 matches rts=10 (<= semantics)
    assert(out(2L) === null)  // nothing at-or-after ts=16
    assert(out(3L) === null)
  }

  test("as-of join returns the matched row's values atomically, NULLs included") {
    import spark.implicits._
    val left = Seq((1L, 20L)).toDF("id", "ts").withColumn("k", lit(100L))
    // matched row (rts=15) has v=NULL but w set; an older row has v set —
    // DuckDB ASOF semantics: BOTH values must come from the rts=15 row
    val right = Seq(
      (100L, 10L, Option("old_v"), Option("old_w")),
      (100L, 15L, None, Option("new_w"))).toDF("k", "rts", "v", "w")
    val row = AsOfJoin.joinBackward(left, right,
      Seq("k"), Seq("k"), "ts", "rts", Seq("v", "w"))
      .select("v", "w").collect().head
    assert(row.isNullAt(0), "matched row's NULL v must be preserved")
    assert(row.getString(1) === "new_w")
  }

  test("short docs (<3 words, NULL shingle sentinel) never pair as near-dups") {
    import spark.implicits._
    val short = Seq((1L, "hi there"), (2L, "buy now"), (3L, "ok"),
      (4L, "a b c d e f g"), (5L, "a b c d e f g")).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the genuinely identical long docs pair; the NULL sentinel must
    // neither key a postings group (ngram) nor survive Jaccard verification
    // (simhash variants — Spark's array_intersect matches NULL to NULL)
    assert(pairs(Dedup.ngramNearDups(short, "doc_id", "text", 7, 10)) === Set((4L, 5L)))
    assert(pairs(Dedup.simhashNearDups(short, "doc_id", "text")) === Set((4L, 5L)))
    assert(pairs(Dedup.simhashNearDupsXx(short, "doc_id", "text")) === Set((4L, 5L)))
    assert(pairs(Dedup.minhashNearDups(short, "doc_id", "text", 7, 10)) === Set((4L, 5L)))
  }

  test("64-bit simhash scale variant finds what the oracle-exact simhash finds") {
    val exact = Dedup.simhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = Dedup.simhashNearDupsXx(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // both verify by the same exact Jaccard; the wide fingerprint's bit
    // scatter differs, so compare post-verification recall
    val recall = exact.intersect(wide).size.toDouble / exact.size
    assert(recall >= 0.9, s"wide-simhash recall $recall vs exact simhash")
  }

  test("connected components: union-find and distributed paths agree") {
    import spark.implicits._
    // chain 1-2-3-4, pair 10-11, singleton 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    def collectLabels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val small = collectLabels(Dedup.connectedComponents(nodes, pairs))
    val dist = collectLabels(
      Dedup.connectedComponents(nodes, pairs, smallGraphMaxEdges = 0))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
    assert(small === expected)
    assert(dist === expected)
  }

  test("exact dedup keeps one row per key") {
    val doubled = docs.unionByName(docs)
    val out = Dedup.exact(doubled, Seq("text"), "doc_id")
    assert(out.count() === docs.count())
    assert(out.agg(max("copies")).collect().head.getLong(0) === 2L)
  }

  test("mixtureSample: a weighted source absent from the corpus makes the mix infeasible") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma", "web"), (2L, "delta epsilon zeta", "web"))
      .toDF("doc_id", "text", "source")
    // 'code' is weighted but has no rows: T = min(n*W div wt) = 0 -> empty
    val out = graft.operators.TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", Map("web" -> 1L, "code" -> 3L))
    assert(out.count() === 0L,
      "infeasible mix must yield an empty sample, not a renormalized one")
    // with the absent source removed the web docs are all kept (wt covers them)
    val ok = graft.operators.TextAnalysis.mixtureSample(
      docs, "doc_id", "text", "source", Map("web" -> 1L))
    assert(ok.count() === 2L)
  }

  test("decontaminate flags eval members and near-copies, not unrelated docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      // near-copy of 1: shares most shingles, differs in the tail
      (2L, "the quick brown fox jumps over the lazy dog again and often"),
      (3L, "completely different content with no shared phrases at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, docs.filter($"doc_id" === 1),
        "doc_id", "text", minShared = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "one row per corpus doc")
    assert(out(1L)._2, "an eval member must flag itself")
    assert(out(2L)._2, "a near-copy of an eval doc must be flagged")
    assert(!out(3L)._2, "unrelated content must pass")
    assert(out(1L)._1 > out(2L)._1,
      "the eval member shares strictly more shingles than its near-copy")
    // shuffle-join fallback (eval set too big to broadcast) is identical
    val noBcast = Dedup.decontaminate(docs, docs.filter($"doc_id" === 1),
        "doc_id", "text", minShared = 3, broadcastEval = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(noBcast === out)
  }

  test("novelty: a verbatim re-scrape scores 0, fresh content 10000") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // first occurrence
      (2L, "alpha beta gamma delta epsilon"),       // verbatim re-scrape
      (3L, "zeta eta theta iota kappa lambda"))     // all-new shingles
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.novelty(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 10000L, "first copy owns every shingle")
    assert(out(2L) === 0L, "re-scrape owns none")
    assert(out(3L) === 10000L, "disjoint content is fully novel")
  }

  test("noveltyIncremental: id-ordered batches reproduce one-shot novelty") {
    val dir = java.nio.file.Files.createTempDirectory("nvidx").toString
    val oneShot = graft.operators.TextAnalysis.novelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // batches must be ID-ORDERED (later batches carry larger ids) for the
    // equivalence to one-shot min-id attribution to hold
    val batched = Seq(
        docs.filter(col("doc_id") < 170),
        docs.filter(col("doc_id") >= 170 && col("doc_id") < 340),
        docs.filter(col("doc_id") >= 340))
      .map { b =>
        graft.operators.TextAnalysis.noveltyIncremental(b, "doc_id", "text", dir)
          .collect()
      }
      .flatten
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(batched === oneShot)
  }

  test("shuffleShards: deterministic, covers all rows, files honor the byte budget") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, 100L + (i % 7) * 50L)).toDF("id", "nb")
    def run() = graft.operators.TextAnalysis
      .shuffleShards(rows, "id", $"nb", nShards = 4, targetBytes = 1000L)
    val a = run().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).sortBy(_._1)
    val b = run().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).sortBy(_._1)
    assert(a.toSeq === b.toSeq, "same input -> same (shard, pos, file_idx)")
    assert(a.length === 200 && a.map(_._1).distinct.length === 200)
    assert(a.map(_._2).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // replay the split rule independently: walking each shard in pos
    // order, file_idx must equal floor(bytes-before-this-row / target)
    a.groupBy(_._2).foreach { case (sh, rs) =>
      val inOrder = rs.sortBy(_._3)
      assert(inOrder.map(_._3).toSeq === (0L until rs.length).toSeq,
        s"shard $sh positions not dense")
      var cum = 0L
      inOrder.foreach { case (id, _, _, fileIdx) =>
        assert(fileIdx === cum / 1000L, s"shard $sh id $id file split off")
        cum += 100L + (id % 7) * 50L
      }
    }
  }

  test("minhashQuality: identical docs measure zero estimator error") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "one two three four five six seven eight nine eleven"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashQuality(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (est12, exact12, err12) = out((1L, 2L))
    assert(est12 === 10000L && exact12 === 10000L && err12 === 0L)
    // the near-pair's estimate stays within 3 sigma of exact
    // (sigma = sqrt(J(1-J)/32) ~ 800 bp around J=0.8)
    out.filterKeys(_ != ((1L, 2L))).values.foreach { case (_, _, err) =>
      assert(err <= 3000L, s"estimator error $err bp implausibly large")
    }
    assert(out.contains((1L, 3L)) || out.contains((2L, 3L)),
      "near-duplicates must surface as band candidates")
  }

  test("pcaPower recovers a planted dominant direction, deterministically") {
    import spark.implicits._
    // data on the line span{(0.8, 0.6, 0, ...)} with a small orthogonal
    // wobble in dim 3 — the top principal component must align with the
    // planted direction, not the wobble
    val rows = (0 until 40).map { i =>
      val t = (i % 9 - 4) * 0.2            // symmetric spread, mean ~0
      val wob = (i % 3 - 1) * 0.01
      (i.toLong, Array(0.8f * t.toFloat, 0.6f * t.toFloat, wob.toFloat,
        0f, 0f, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    def run() = graft.operators.Similarity
      .pcaPower(rows, "embedding", dim = 8, rounds = 3)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    val w = run()
    assert(w.toSeq === run().toSeq, "fixed start + integer grid => bit-deterministic")
    val main = math.max(math.abs(w(0)), math.abs(w(1)))
    assert(main === 1000000L, "the dominant component carries the max grid value")
    // 0.8 : 0.6 ratio within the integer-grid tolerance of the 3 rounds
    assert(math.abs(w(0).toDouble / w(1) - 0.8 / 0.6) < 0.02,
      s"direction off: ${w.toSeq}")
    (2 until 8).foreach(i => assert(math.abs(w(i)) < 100000L,
      s"off-axis dim $i too large: ${w(i)}"))
  }

  test("layoutPlan: ceil arithmetic and the never-zero file floor") {
    import spark.implicits._
    val df = Seq(
      ("a", 100L), ("a", 100L), ("a", 100L),   // 300 bytes -> 1 file
      ("b", 900L), ("b", 900L), ("b", 900L),   // 2700 bytes -> 3 files
      ("c", 0L))                               // 0 bytes -> floor 1 file
      .toDF("g", "nb")
    val out = graft.operators.Profile.layoutPlan(df, Seq("g"), $"nb", 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") === ((3L, 300L, 1L, 3L)))
    assert(out("b") === ((3L, 2700L, 3L, 1L)))
    assert(out("c") === ((1L, 0L, 1L, 1L)))
  }
}
