package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. PageRank here is the
  * link-analysis shape of corpus curation (authority-weighting pages /
  * domains before sampling) — and the representative "iterate a join +
  * aggregate to a fixpoint" workload whose scale behavior matters: each
  * iteration is ONE equi-join of the rank table with the edge list plus ONE
  * `groupBy(dst).sum` — both shuffle on the same key, no driver-side graph
  * state, edge list never materializes on one node.
  *
  * All arithmetic is exact 64-bit integer: ranks are scaled to
  * `scale / N` units and contributions use integer division, so results are
  * bit-identical across engines and partitionings (a floating-point
  * PageRank's sums depend on reduction order). Precision loss per division
  * is < 1 unit = `1/scale` of total mass — negligible for ranking at
  * `scale = 10^12`.
  *
  * Requirements (default mode): every node must have at least one OUT-edge
  * (build the edge list bidirectionally for undirected graphs); node ids
  * non-negative and distinct across node classes (offset one side of a
  * bipartite graph). Real web/link graphs violate the out-edge requirement
  * constantly (sink pages) — `danglingMass = true` lifts it with the
  * standard dangling-mass redistribution: sinks' rank is summed each round
  * (one extra aggregate over a one-row frame) and every node receives an
  * equal integer share, keeping the arithmetic exact.
  */
object Graph {

  /** `iters` damped PageRank rounds over `edges(src, dst)`. Returns
    * `(id, rank)` with rank in integer `1/scale` units of total mass.
    * Damping is the exact rational `dampNum/dampDen` (default 85/100).
    *
    * Per-round plan: rank ⋈ edges on src (shuffle on src — edges can be
    * pre-bucketed on src to eliminate it), groupBy dst (shuffle on dst),
    * left join back to the node list for no-inlink nodes. The rank frame is
    * `localCheckpoint`ed each round so the logical plan stays flat across
    * iterations (lineage growth, not data volume, is what kills iterative
    * DataFrame jobs). */
  /** Fold each source's out-degree onto its edges so every pagerank round
    * is a single join. NOT a window: WindowExec sorts its input on the
    * partition keys, a full sort of the edge list; this aggregate+join
    * reuses the input's partitioning on `src` (repartitioned, cached, or
    * bucketed). `broadcastDegrees` fits graphs whose distinct-source count
    * broadcasts comfortably (one row per source); disable it for
    * billion-node graphs and the join stays co-located on src anyway. */
  def withDegrees(part: DataFrame, broadcastDegrees: Boolean): DataFrame = {
    val deg = part.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    part.join(if (broadcastDegrees) broadcast(deg) else deg, "src")
  }

  /** One pagerank round's mass flow: each source's rank split integrally
    * across its out-edges, summed per destination. Exposed so plan tests
    * can assert the per-round shape (with a bucketed edge table the edge
    * side of the join carries NO exchange — only the rank frame moves). */
  def contributions(e: DataFrame, rank: DataFrame): DataFrame =
    e.join(rank, e("src") === rank("id"))
      .select(col("dst").as("id"),
        expr("`rank` div outdeg").as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("m"))

  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      edgesDistinct: Boolean = false,
      broadcastDegrees: Boolean = true,
      prePartitioned: Boolean = false,
      broadcastRank: Boolean = false,
      danglingMass: Boolean = false): DataFrame = {
    // static frames are CACHED (lazy, reused every round); only the evolving
    // rank is checkpointed, and only every few rounds — an eager checkpoint
    // per round would serialize the loop into iters separate jobs
    val raw = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // dedup is semantics (parallel edges must not double-weight) but it is
    // the most expensive shuffle here — callers that construct provably
    // distinct edge lists (e.g. mirrored distinct pairs) skip it
    val deduped = if (edgesDistinct) raw else raw.distinct()
    // pre-partition on the per-round join key: the cached partitioning is
    // reused by every iteration's join, so only the (small) rank side
    // moves — the edge list never re-shuffles after this. When the caller
    // reads a table bucketed on src (`Distribution.writeBucketed`), the
    // scan already delivers that partitioning and `prePartitioned = true`
    // makes the FIRST materialization exchange-free too (the long cast
    // below is erased by SimplifyCasts for long columns, so the bucketed
    // partitioning survives the projection).
    // broadcastRank makes the per-round join a broadcast hash join, which
    // streams ANY partitioning — pre-partitioning the edges would be a full
    // shuffle that buys nothing, so skip it on that path too
    val part =
      if (prePartitioned || broadcastRank) deduped
      else deduped.repartition(col("src"))
    val e = withDegrees(part, broadcastDegrees).cache()
    // default mode: every node has an out-edge (operator requirement), so
    // the distinct sources ARE the node set. With dangling support the dst
    // side is unioned in (sinks appear only as destinations), and the
    // sinks themselves are the anti-join of the two — they feed the
    // per-round mass redistribution.
    val sources = e.select(col("src").as("id")).distinct()
    val nodes =
      (if (danglingMass)
        sources.union(e.select(col("dst").as("id"))).distinct()
      else sources).cache()
    val dangling =
      if (danglingMass)
        Some(nodes.join(sources, Seq("id"), "left_anti").cache())
      else None

    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    // exact integer teleport mass per node: computed once, mirrored verbatim
    // by the SQL oracle — division ORDER is part of the contract
    val unit = scale / n
    val teleport = (dampDen - dampNum) * unit / dampDen

    // `broadcastRank`: the rank table is one row per NODE while the edge
    // list is one row per EDGE — for graphs with high average degree (or
    // just node counts that broadcast comfortably) shipping the rank to the
    // edges replaces the per-round sort-merge join (full sort of the edge
    // list + shuffle of the rank) with a broadcast hash join over the
    // cached edge partitions: the only per-round exchange left is the
    // map-side-combined contribution aggregate (≤ one row per node per
    // task). Same results bit-identically — only the join strategy moves.
    // Off by default: at billion-node scale the rank no longer broadcasts
    // and the co-partitioned SMJ path is the right shape.
    def hinted(df: DataFrame) = if (broadcastRank) broadcast(df) else df
    var rank = nodes.select(col("id"), lit(unit).as("rank"))
    // dangling mode consumes `rank` TWICE per round (contributions + the
    // sink-mass sum): left nested lazily, both branches re-evaluate the
    // whole prior-round plan and the recompute doubles per iteration
    // (measured: 6.3 s vs 4.8 s for the single-use loop at 3 iters). An
    // eager per-round checkpoint of the tiny rank table makes both uses a
    // block scan; superseded rounds are released immediately.
    var prevCkpt: Option[DataFrame] = None
    for (i <- 0 until iters) {
      val contrib = contributions(e, hinted(rank))
      // dangling redistribution: the sinks' total rank (ONE row — an
      // aggregate, broadcast-crossed onto the update) is shared integrally
      // by every node; `dm div n` floors exactly as the oracle's `//`
      val base = nodes.join(hinted(contrib), Seq("id"), "left")
      val withMass = dangling match {
        case Some(d) =>
          val dm = rank.join(d, Seq("id"))
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
          base.crossJoin(broadcast(dm))
            .withColumn("m", coalesce(col("m"), lit(0L)) + expr(s"dm div $n"))
        case None => base
      }
      rank = withMass
        .select(col("id"),
          (lit(teleport) +
            expr(s"$dampNum * coalesce(m, 0L) div $dampDen")).as("rank"))
      // truncate lineage before the plan tree grows superlinear (driver
      // planning time, not data volume, kills long iterative loops); in
      // dangling mode every round checkpoints (double-use, see above).
      // Superseded checkpoints are released as soon as the next one
      // materializes (eager) — a long loop must not pin one rank-table
      // copy per checkpoint for the session's life.
      val checkpointNow =
        danglingMass || ((i + 1) % 4 == 0 && i != iters - 1)
      if (checkpointNow) {
        rank = rank.localCheckpoint()
        prevCkpt.foreach(Checkpoints.release)
        prevCkpt = Some(rank)
      }
    }
    // one eager materialization hands back a dependency-free result, so the
    // caches can be released immediately. OWNERSHIP: the returned frame is
    // checkpoint-persisted; the caller owns its lifecycle and should
    // release it with `Checkpoints.release(result)` when done — NOT
    // `unpersist()`, which cannot see checkpoint blocks (long-lived
    // sessions invoking many operators would otherwise bleed executor
    // storage one result at a time; the bench releases every entry's
    // result under this contract)
    // when the loop's last round already checkpointed `rank`, that
    // checkpoint IS the result handed to the caller (ownership contract
    // above); otherwise materialize once, then release any superseded
    // intermediate checkpoint the loop still holds
    val result =
      if (prevCkpt.exists(_ eq rank)) rank
      else {
        val r = rank.localCheckpoint()
        prevCkpt.foreach(Checkpoints.release)
        r
      }
    e.unpersist(); nodes.unpersist(); dangling.foreach(_.unpersist())
    result
  }
}
