package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules over (basket, item) rows — the
  * co-occurrence affinity mining ("customers who bought X also bought Y")
  * that doubles as tag/topic affinity analysis over document corpora.
  *
  * All statistics are exact integer counts over distinct (basket, item)
  * memberships; confidence and lift are single divisions of exact values,
  * so every number is bit-reproducible. The pair space never goes through
  * a cartesian product: candidate pairs come from the within-basket
  * self-equi-join on the basket key, bounded by Σ C(|basket|, 2) — and
  * `maxBasketSize` enforces that bound: one degenerate basket (a crawler
  * session with 10⁵ items) is C(10⁵,2) ≈ 5·10⁹ join rows in ONE task, a
  * skew bomb no amount of cluster width absorbs. Over-cap baskets are
  * dropped whole (the [[Linkage.fuzzyPairs]] rule: a basket with
  * thousands of items has stopped being a basket and only poisons the
  * affinity statistics), via a window count on the basket key — no extra
  * shuffle beyond the one the self-join already needs.
  */
object BasketAnalysis {

  /** Rules `a ⇒ b` (both directions) with
    * `support(ab) >= minSupport` baskets:
    * conf = s_ab/s_a, lift = N·s_ab/(s_a·s_b). Output:
    * (ante, cons, s_ab, conf, lift) rounded at 6, ordered nowhere — rank
    * downstream. Input rows are (basketCol, itemCol); duplicates within a
    * basket are collapsed first; baskets with more than `maxBasketSize`
    * distinct items are dropped entirely BEFORE the pair join (they also
    * don't count toward item supports or the basket total, keeping
    * conf/lift consistent with the mined universe). */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketSize: Option[Int] = None): DataFrame = {
    val m0 = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val m = maxBasketSize match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))
        m0.withColumn("bn", count(lit(1)).over(w))
          .filter(col("bn") <= cap).drop("bn")
      case None => m0
    }
    val items = m.groupBy(col("it")).agg(count(lit(1)).as("s"))
    val nB = m.agg(count_distinct(col("bk")).as("nb"))
    val pairCnt = m.select(col("bk"), col("it").as("ia"))
      .join(m.select(col("bk"), col("it").as("ib")), Seq("bk"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("s_ab"))
      .filter(col("s_ab") >= minSupport)
    // both rule directions from the one canonical pair count
    val directed = pairCnt.select(col("ia").as("ante"), col("ib").as("cons"),
        col("s_ab"))
      .unionByName(pairCnt.select(col("ib").as("ante"), col("ia").as("cons"),
        col("s_ab")))
    directed
      .join(items.select(col("it").as("ante"), col("s").as("s_a")), Seq("ante"))
      .join(items.select(col("it").as("cons"), col("s").as("s_b")), Seq("cons"))
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("s_ab"),
        round(col("s_ab").cast("double") / col("s_a"), 6).as("conf"),
        round(col("nb").cast("double") * col("s_ab") /
          (col("s_a") * col("s_b")), 6).as("lift"))
  }

  /** Item-item collaborative-filtering neighbors: per item, the `topK`
    * most-similar items by binary cosine over the user-interaction sets —
    * `cos(i, j) = c_ij / √(n_i·n_j)` with `c_ij` the users interacting
    * with both and `n_i` each item's user count. The "users who engaged
    * with X also engaged with Y" recommender primitive, and (read over
    * documents × sources) a source-affinity readout for corpus curation.
    *
    * Exactness: all counts are exact longs over distinct (user, item)
    * memberships; the single mirrored double op is
    * `cos_micro = round(10⁶·c/√(n_i·n_j))`. Per-item neighbor ranking
    * breaks ties (cos, then neighbor id) so the top-k cut is total-ordered.
    *
    * Plan shape: one user-grain basket aggregate (collect_set) feeds
    * BOTH the norms and the candidate pairs — the Σ C(|user items|, 2)
    * pair space is generated per basket by an array transform (map-side
    * compute, never a join, never a cartesian) — with `maxUserItems`
    * enforcing the bound exactly like [[rules]]' basket cap (over-cap
    * users are dropped whole BEFORE pairing and norms, keeping cosines
    * consistent with the mined universe; a crawler account touching 10⁵
    * items is a skew bomb, not a taste profile). The per-item top-k is a
    * window over the bounded pair table, partitioned on the item.
    *
    * Output: (item, neighbor, c, cos_micro, rn), rn ≤ `topK`, both
    * directions of every pair. */
  def itemCosine(df: DataFrame, userCol: String, itemCol: String,
      topK: Int, maxUserItems: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE user-grain aggregate replaces the round-10 distinct + cap
    // window + per-user self-equi-join (three shuffles of the membership
    // table): collect_set dedups (u, it) within the group, the cap is a
    // free size() filter on the basket row, and the C(n_u, 2) pair space
    // is GENERATED per basket by two codegen'd Generates (posexplode +
    // slice — NOT a transform() lambda chain: higher-order functions
    // evaluate interpreted and allocate the per-row pair array whole,
    // where the Generate pair streams). Same enforced bound (over-cap
    // users dropped whole), same pair universe — parity-checked row-set
    // equal to the round-10 formulation at sf0.1 in the round-14 profile.
    val baskets = df.select(col(userCol).as("u"), col(itemCol).as("it"))
      .filter(col("u").isNotNull && col("it").isNotNull)
      .groupBy(col("u"))
      .agg(array_sort(collect_set(col("it"))).as("its"))
    val capped = maxUserItems match {
      case Some(cap) => baskets.filter(size(col("its")) <= cap)
      case None => baskets
    }
    // norms come from the FULL capped membership (single-item users count
    // toward n_i even though they generate no pairs); the identical
    // `capped` subtree reuses the basket exchange
    val norms = capped.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n"))
    // its is sorted ascending, so generated pairs satisfy ia < ib.
    // The generated pair stream is ~97% DISTINCT keys (sf0.1: 13.14M
    // generated, 12.72M distinct), so a map-side partial aggregate gets
    // ~no reduction while building a hash map over every pair its task
    // generates — ~1.3 GB across tasks, which crossed the spill threshold
    // whenever suite heap state tightened execution memory (the r15 q138
    // blow-up mode: 1074 MB mem-spill + sort fallback + GC at -Xmx4g,
    // intermittent 10x at 8g under full-suite JVM state). An explicit
    // hash repartition on the pair key shuffles the RAW pairs (two longs
    // — same exchange volume as the 97%-unaggregated rows) and runs BOTH
    // aggregate stages post-exchange, where each task owns ~#pairs/P keys
    // (~20 MB at P=32): the hash map can no longer outgrow its share of
    // the pool at any heap state. Explicit numPartitions pins the
    // exchange against AQE coalescing (64 MB advisory would fold ~200 MB
    // of pairs to ~3 partitions and re-create the giant maps); at cluster
    // scale the same session conf carries the configured parallelism.
    val pairParts = df.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(200)
    val pairs = capped.filter(size(col("its")) >= 2)
      .select(col("its"), posexplode(col("its")).as(Seq("i", "ia")))
      .select(col("ia"), explode(expr("slice(its, i + 2, size(its))")).as("ib"))
      .repartition(pairParts, col("ia"), col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))
    // norms attach on the UNDIRECTED pair table (half the directed row
    // count; AQE broadcasts the item-grain build side at runtime), and
    // both directions come from one explode — never a union re-read
    val scored = pairs
      .join(norms.select(col("it").as("ia"), col("n").as("n_a")), Seq("ia"))
      .join(norms.select(col("it").as("ib"), col("n").as("n_b")), Seq("ib"))
      .select(explode(array(
        struct(col("ia").as("item"), col("ib").as("neighbor"), col("c"),
          col("n_a").as("n_i"), col("n_b").as("n_j")),
        struct(col("ib").as("item"), col("ia").as("neighbor"), col("c"),
          col("n_b").as("n_i"), col("n_a").as("n_j")))).as("d"))
      .select(col("d.item").as("item"), col("d.neighbor").as("neighbor"),
        col("d.c").as("c"), expr(
        "CAST(round(1e6 * d.c / sqrt(CAST(d.n_i AS DOUBLE) * d.n_j)) AS BIGINT)")
        .as("cos_micro"))
    // the top-k cut stays a WINDOW: Spark's rank-limit pushdown plans a
    // map-side WindowGroupLimit, so only ~k-per-item-per-task rows cross
    // the exchange, and the round-14 profile measured the bounded-
    // aggregate alternative (a TopK-style typed UDAF over the directed
    // table) SLOWER than the codegen'd sort — object-buffer updates per
    // pair row cost more than sorting compact rows — so q58's map-side-
    // combine argument does not transfer here
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos_micro").desc, col("neighbor").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("item"), col("neighbor"), col("c"), col("cos_micro"),
        col("rn"))
  }
}
