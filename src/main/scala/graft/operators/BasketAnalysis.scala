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
    * Plan shape: candidate pairs come from the per-user self-equi-join —
    * Σ C(|user items|, 2), never a cartesian — with `maxUserItems`
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
    val m0 = df.select(col(userCol).as("u"), col(itemCol).as("it"))
      .filter(col("u").isNotNull && col("it").isNotNull)
      .distinct()
    val m = maxUserItems match {
      case Some(cap) =>
        val w = Window.partitionBy(col("u"))
        m0.withColumn("un", count(lit(1)).over(w))
          .filter(col("un") <= cap).drop("un")
      case None => m0
    }
    val norms = m.groupBy(col("it")).agg(count(lit(1)).as("n"))
    val pairs = m.select(col("u"), col("it").as("ia"))
      .join(m.select(col("u"), col("it").as("ib")), Seq("u"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))
    val directed = pairs.select(col("ia").as("item"), col("ib").as("neighbor"),
        col("c"))
      .unionByName(pairs.select(col("ib").as("item"), col("ia").as("neighbor"),
        col("c")))
    val scored = directed
      .join(norms.select(col("it").as("item"), col("n").as("n_i")), Seq("item"))
      .join(norms.select(col("it").as("neighbor"), col("n").as("n_j")),
        Seq("neighbor"))
      .withColumn("cos_micro", expr(
        "CAST(round(1e6 * c / sqrt(CAST(n_i AS DOUBLE) * n_j)) AS BIGINT)"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos_micro").desc, col("neighbor").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("item"), col("neighbor"), col("c"), col("cos_micro"),
        col("rn"))
  }
}
