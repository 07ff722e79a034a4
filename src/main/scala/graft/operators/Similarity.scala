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
}
