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
  * Requirements: every node must have at least one OUT-edge (build the edge
  * list bidirectionally for undirected graphs); node ids non-negative and
  * distinct across node classes (offset one side of a bipartite graph).
  * Dangling-mass redistribution is deliberately omitted under that
  * requirement.
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
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id")).distinct()
      .unionByName(e.select(col("dst").as("id")).distinct())
      .distinct().localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))

    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    // exact integer teleport mass per node: computed once, mirrored verbatim
    // by the SQL oracle — division ORDER is part of the contract
    val unit = scale / n
    val teleport = (dampDen - dampNum) * unit / dampDen

    var rank = nodes.select(col("id"), lit(unit).as("rank")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = e.join(rank, e("src") === rank("id"))
        .join(deg, "src")
        .select(col("dst").as("id"),
          expr("`rank` div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("m"))
      rank = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"$dampNum * coalesce(m, 0L) div $dampDen")).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
