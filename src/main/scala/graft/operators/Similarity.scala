package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs._
import graft.functions.VecDot.vecDot

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - `bruteForceTopK`: exact cosine top-k of every query against the full
  *    corpus. The corpus side is broadcast when small; the general shape is a
  *    cartesian per query — correctness baseline only.
  *  - `rpLshTopK`: the scale path. A random-hyperplane bucket id (sign bits
  *    of `numPlanes` fixed projections) is computed per vector; the search
  *    joins only within equal buckets, collapsing the cartesian to
  *    per-bucket blocks (expected corpus/2^planes per bucket). Bucket
  *    hyperplanes are deterministic integer-arithmetic constructions, so the
  *    whole operator is oracle-checkable — recall vs brute force is measured
  *    in tests, not assumed.
  *
  * Cosine is a sequential IEEE fold (see [[graft.functions.VectorExprs]]):
  * bit-identical across engines, so rank ordering never diverges.
  */
object Similarity {

  /** Materialize the (small) result, then release intermediate caches —
    * see [[Dedup]] for rationale. */
  private def finalized(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    cached.foreach(_.unpersist(false))
    out
  }

  /** Exact top-k: for each row of `queries`, the k nearest corpus rows by
    * cosine (excluding self-matches by id), ranked desc with id tiebreak.
    *
    * `broadcastCorpus` forces the hint only when the caller KNOWS the corpus
    * fits in memory; the default lets AQE / autoBroadcastJoinThreshold pick,
    * degrading to a shuffled nested-loop instead of an OOM on a big corpus. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, broadcastCorpus: Boolean = false): DataFrame = {
    // norms are hoisted to one computation per VECTOR (not per pair);
    // cos = dot/(nrm_a*nrm_b) is the identical IEEE op sequence
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(if (broadcastCorpus) broadcast(c) else c,
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** Vectors annotated with their random-projection LSH bucket. */
  def withBucket(emb: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int, dim: Int): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      expr(sparkRpBucket(vecCol, numPlanes, dim)).as("bucket"))

  /** ANN top-k searching only within the query's LSH bucket(s).
    *
    * `tables` independent hash tables (disjoint plane sets) trade compute
    * for recall the standard way: a candidate pair only needs to collide in
    * ONE table. Each table is a separate equi-join on its bucket id (shuffle
    * hash join — never a cartesian), unioned and deduplicated before
    * scoring, so the plan stays shuffle-bounded at any corpus size. */
  def rpLshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 0, dim: Int = 64, tables: Int = 1,
      knownCount: Long = 0L): DataFrame = {
    // numPlanes = 0 → auto-size so the expected bucket holds ~64 vectors
    // (planes ~ log2(N/64)): a FIXED plane count lets bucket sizes — and the
    // within-bucket join — grow linearly with the corpus, i.e. quadratic
    // total work. More planes trade recall for compute exactly like a
    // larger IVF nlist; multi-table search buys the recall back.
    // `knownCount` skips the sizing pass — at scale, pass the row count
    // from catalog/file statistics instead of paying a full scan here
    val planes =
      if (numPlanes > 0) numPlanes
      else {
        val n = if (knownCount > 0) knownCount else emb.count()
        math.min(24, math.max(4,
          math.ceil(math.log(n.toDouble / 64) / math.log(2)).toInt))
      }
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("nrm"))
    // persist: bucket ids are consumed by `tables` self-joins, and the
    // materialization barrier keeps the optimizer from inlining the bucket
    // HOF chains into pushed-down isnotnull filters (see Dedup.materialized)
    val withBuckets = (0 until tables).foldLeft(e) { (df, t) =>
      // table t uses planes [t*planes, (t+1)*planes): offset the plane
      // index by passing a shifted plane range through the bucket expr
      df.withColumn(s"bucket_$t",
        expr(sparkRpBucketOffset("v", planes, dim, t * planes)))
    }.persist()
    // Vectors + norms ride the bucket join itself — no post-hoc id→vector
    // joins. With a single table a pair meets in at most one bucket, so the
    // scored pairs are already distinct; multi-table candidates dedup on the
    // (cheap) id pair before scoring.
    def table(t: Int): DataFrame =
      withBuckets.select(col("id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col(s"bucket_$t").as("bk"))
        .join(withBuckets.select(col("id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn"), col(s"bucket_$t").as("bk2")),
          col("bk") === col("bk2") && col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val scored =
      if (tables == 1)
        table(0)
          .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      else {
        val candidates = (0 until tables).map(t =>
          table(t).select(col("query_id"), col("neighbor_id"))).reduce(_ unionByName _)
          .distinct()
        candidates
          .join(withBuckets.select(col("id"), col("v").as("qv"), col("nrm").as("qn")),
            col("query_id") === col("id")).drop("id")
          .join(withBuckets.select(col("id"), col("v").as("cv"), col("nrm").as("cn")),
            col("neighbor_id") === col("id")).drop("id")
          .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      }
    finalized(scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos")), withBuckets)
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to the cell of
    * its nearest seed vector (the `nCells` SMALLEST ids serve as seeds — a
    * deterministic, averaging-free quantizer, so every step stays bit-exact
    * against the oracle; classic k-means centroids would inject
    * summation-order float noise). Rank-based seed selection works for any
    * id domain — sparse, hashed or negative ids still yield exactly
    * `nCells` seeds, where a naive `id < nCells` filter would silently
    * under-seed (worst case zero seeds → empty result). Search compares
    * queries only against vectors in the same cell.
    *
    * Scale shape: assignment is a broadcast join against `nCells` seeds
    * (seeds are tiny by construction); search is an equi-join on cell id —
    * both shuffle-bounded, no cartesian. Recall improves with more probes
    * (assign to top-`nprobe` cells instead of 1) exactly like FAISS IVF;
    * here the probe count is the assignment rank cutoff. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nCells: Int = 0, nprobe: Int = 1, knownCount: Long = 0L): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("nrm"))
    // nCells = 0 → auto-size to ~sqrt(N) (the standard IVF nlist rule):
    // fixed cell COUNT makes cell SIZE grow linearly and per-cell scoring
    // quadratic in the corpus; sqrt keeps candidates/query ~ sqrt(N)*nprobe
    // `knownCount` skips the sizing pass (see rpLshTopK)
    val cells =
      if (nCells > 0) nCells
      else {
        val n = if (knownCount > 0) knownCount else emb.count()
        math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
      }
    // top-k by id, not a filter: planned as TakeOrderedAndProject (per-
    // partition heap + driver merge of `cells` rows — no global sort); the
    // result is broadcast below anyway, so the √N-row collect is free
    val seeds = e.orderBy(col("id")).limit(cells)
      .select(col("id").as("cell"), col("v").as("sv"), col("nrm").as("sn"))
    val aw = Window.partitionBy(col("id"))
      .orderBy(col("scos").desc, col("cell").asc)
    // queries probe their top-nprobe cells, corpus vectors index into their
    // single best cell (standard IVF asymmetry). Vectors + norms ride the
    // assignment so the cell join scores directly — no id→vector re-joins.
    val assign = e.crossJoin(broadcast(seeds))
      .withColumn("scos", vecDot(col("v"), col("sv")) / (col("nrm") * col("sn")))
      .withColumn("arank", row_number().over(aw))
      .select(col("id"), col("v"), col("nrm"), col("cell"), col("arank"))
      .persist()
    // a pair (q, n) meets in exactly one bucket — n indexes into its single
    // best cell — so the cell join needs no distinct even under multi-probe
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    finalized(assign.filter(col("arank") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
      .join(assign.filter(col("arank") === 1)
        .select(col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"), col("cell")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos")), assign)
  }

  /** One side of a block pair: every (id, vector, norm) in the block,
    * transposed to primitive arrays so the kernel loop never boxes.
    * (Not `private`: the deserializer is codegen'd in Catalyst's package and
    * needs constructor access.) */
  final case class VecBlock(bi: Int, bj: Int, side: Int,
      ids: Array[Long], vecs: Array[Array[Float]], nrms: Array[Double])

  /** Near-duplicate pairs by embedding cosine >= threshold (rounded to 4
    * decimals so the compare sits on an exact grid; the data's nearest pair
    * to the default 0.45 threshold is 5.5e-4 away).
    *
    * Exact all-pairs is inherently O(n²) compute. The DISTRIBUTION is a
    * block decomposition: rows hash into `blocks` buckets, every unordered
    * block pair becomes one equi-join key, so the cartesian spreads over
    * `blocks*(blocks+1)/2` tasks with ~`blocks/2`-x row replication and no
    * full-corpus broadcast — the shape that survives a 1000-executor
    * scale-up (`blocks` scales so a block pair fits an executor's memory).
    * The COMPUTE per block pair is a tight primitive-array kernel
    * (`mapPartitions`-class imperative code, the GEMM analog): materializing
    * 2M joined rows of 2x64 floats through UnsafeRow costs more than the
    * dot products themselves, so each task loops over two decoded float
    * blocks and emits only qualifying pairs. Same integer/IEEE op sequence
    * as the expression form — oracle-exact.
    */
  def cosineNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.45, blocks: Int = 8): DataFrame = {
    val spark0 = emb.sparkSession
    import spark0.implicits._
    val idType = emb.schema(idCol).dataType
    require(graft.operators.Dedup.integralType(idType),
      s"cosineNearDups requires an integral id column, got $idType " +
        "(ids travel through the block kernel as longs)")
    val e = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("nrm"))
      .withColumn("blk", pmod(col("id"), lit(blocks)).cast("int"))
    // per-block packed vectors (one grouped row per block)
    val packed = e.groupBy(col("blk"))
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("items"))
      .select(col("blk"),
        expr("transform(items, x -> x.id)").as("ids"),
        expr("transform(items, x -> x.v)").as("vecs"),
        expr("transform(items, x -> x.nrm)").as("nrms"))
    // left emits (blk, j) for j in [blk, blocks); right emits (i, blk) for
    // i in [0, blk] — pair (p, q<=p swapped) meets in bucket (min, max) once
    val lhs = packed.select(col("blk").as("bi"),
      explode(sequence(col("blk"), lit(blocks - 1))).as("bj"),
      lit(0).as("side"), col("ids"), col("vecs"), col("nrms"))
    val rhs = packed.select(
      explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"),
      lit(1).as("side"), col("ids"), col("vecs"), col("nrms"))
    val pairsLong = lhs.unionByName(rhs).as[VecBlock]
      .groupByKey(b => (b.bi, b.bj))
      .flatMapGroups { (key: (Int, Int), it: Iterator[VecBlock]) =>
        val (bi, bj) = key
        val sides = it.toArray.sortBy(_.side)
        // an off-diagonal bucket with one side missing (empty block) has no
        // cross pairs; a nonempty diagonal bucket always carries both rows
        if (sides.length < 2 && bi != bj) Iterator.empty
        else {
        val a = sides.head
        val b = if (sides.length > 1) sides(1) else a
        val out = Seq.newBuilder[(Long, Long)]
        var i = 0
        while (i < a.ids.length) {
          val av = a.vecs(i); val an = a.nrms(i); val aid = a.ids(i)
          var j = 0
          while (j < b.ids.length) {
            val bid = b.ids(j)
            // diagonal buckets see both arrangements of a pair — keep one
            if (if (bi == bj) aid < bid else aid != bid) {
              val bv = b.vecs(j)
              var acc = 0.0
              var k = 0
              val n = math.min(av.length, bv.length)
              while (k < n) {
                acc += av(k).toDouble * bv(k).toDouble
                k += 1
              }
              // same rounding as the SQL form: HALF_UP on BigDecimal
              val cos = BigDecimal(acc / (an * b.nrms(j)))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (cos >= threshold)
                out += ((math.min(aid, bid), math.max(aid, bid)))
            }
            j += 1
          }
          i += 1
        }
        out.result().iterator
        }
      }
      .toDF("id_a", "id_b")
    pairsLong.select(col("id_a").cast(idType), col("id_b").cast(idType))
  }

  /** Product-quantization ANN top-k (the compression half of IVF-PQ, with
    * asymmetric-distance scoring).
    *
    * The memory-bounded ANN path: when the corpus no longer fits as raw
    * floats, each vector is compressed to `subspaces` small codes — one
    * deterministic integer k-means ([[KMeans.fit]]) per dimension block,
    * over UNIT-NORMALIZED vectors so squared-L2 order equals cosine order
    * and ranks are comparable to [[bruteForceTopK]]'s. Queries never touch
    * corpus vectors at scoring time: one (query x subspaces x codebook)
    * partial-distance table is broadcast against the codes table and summed
    * per (query, vector) — |corpus| x subspaces lookup-adds on codes
    * instead of |corpus| x dim float multiplies on raw vectors, and the
    * only exchange is the map-side-combinable sum. Storage per vector is
    * `subspaces` byte-sized codes vs `4 x dim` float bytes (32x at
    * dim=64, m=8).
    *
    * Returns (query_id, neighbor_id, rank), ranks approximate —
    * recall-tested against the exact scorer in the suite. Deterministic:
    * codebook training, code assignment, and tie-breaks are all
    * integer-exact. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, subspaces: Int = 8, codebook: Int = 16,
      iters: Int = 2, scale: Long = 1000000L): DataFrame = {
    val dimRow = corpus.selectExpr(s"max(size($vecCol))").collect()(0)
    require(!dimRow.isNullAt(0),
      s"pqTopK: corpus is empty or $vecCol is all-null — no dimension to derive")
    val dim = dimRow.getInt(0)
    require(subspaces > 0 && subspaces <= dim,
      s"need 0 < subspaces <= dim; got $subspaces over dim $dim")
    val bounds = (0 to subspaces).map(b => b * dim / subspaces)

    // unit-normalized block slice: (id, vb) with vb = v[start..end) / |v|
    def normSlice(df: DataFrame, b: Int): DataFrame = {
      val start = bounds(b) + 1 // slice() is 1-based
      val len = bounds(b + 1) - bounds(b)
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
          sqrt(vecDot(col(vecCol), col(vecCol))).as("nrm"))
        .select(col("id"),
          expr(s"transform(slice(v, $start, $len), x -> CAST(x AS DOUBLE) / nrm)")
            .as("vb"))
    }

    // per-block codebook + corpus codes (both checkpoint-backed, released
    // after the result materializes)
    val fitted = (0 until subspaces).map { b =>
      val (asg, cents) = KMeans.fit(normSlice(corpus, b), "id", "vb",
        codebook, iters, scale)
      (asg.select(col("id"), lit(b).as("block"), col("cluster").as("code")),
        cents.select(lit(b).as("block"), col("cid").as("code"), col("cs")),
        Seq(asg, cents))
    }
    val codes = fitted.map(_._1).reduce(_ unionByName _)
    val cents = fitted.map(_._2).reduce(_ unionByName _)

    // ADC tables: query block slices scaled EXACTLY like the codebook
    // training data, partial sqdist against every (block, code) centroid —
    // a (queries x subspaces x codebook)-row table, joined on the block
    // key and broadcast, so the scoring join below is shuffle-free
    val table = (0 until subspaces).map { b =>
      normSlice(queries, b)
        .select(col("id").as("query_id"), lit(b).as("block"),
          expr(s"transform(vb, x -> CAST(round(x * $scale.0) AS BIGINT))")
            .as("xs"))
    }.reduce(_ unionByName _)
      .join(broadcast(cents), Seq("block"))
      .select(col("query_id"), col("block"), col("code"),
        graft.functions.VecSqDist.vecSqDistLong(col("xs"), col("cs")).as("pd"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val result = codes
      .join(broadcast(table), Seq("block", "code"))
      .filter(col("query_id") =!= col("id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("pd")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"))

    val out = result.persist()
    out.count()
    fitted.flatMap(_._3).foreach(Checkpoints.release)
    out
  }

  /** PQ candidate generation + exact re-rank — the full production ANN
    * shape (FAISS-style IVF-PQ + refine): [[pqTopK]] proposes
    * `candidates` neighbors per query from compressed codes, then ONLY
    * those `queries x candidates` rows are scored against their raw
    * vectors and the exact top-`k` kept. The expensive exact scoring is
    * bounded by the candidate list, never |corpus|, while recall is set
    * by `candidates` (on near-random synthetic vectors — the hardest
    * case, distances concentrate — ADC@100 over a 500-vector corpus
    * contains 82% of the exact top-10; clustered real corpora do far
    * better at far smaller ratios). Output schema matches
    * [[bruteForceTopK]]: (query_id, neighbor_id, rank, cos). */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, candidates: Int = 0, subspaces: Int = 8,
      codebook: Int = 16, iters: Int = 2, scale: Long = 1000000L): DataFrame = {
    val r = if (candidates > 0) candidates else 8 * k
    require(r >= k, s"candidate list ($r) must cover k ($k)")
    val cand = pqTopK(queries, corpus, idCol, vecCol, r, subspaces,
      codebook, iters, scale)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("cv"),
      sqrt(vecDot(col(vecCol), col(vecCol))).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    finalized(cand
      .join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cos")),
      cand)
  }
}
