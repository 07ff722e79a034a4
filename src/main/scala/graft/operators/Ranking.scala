package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics document scoring: TF-IDF feature extraction and BM25
  * ranking — the relevance/quality-weighting stage of a training-data
  * pipeline (boilerplate down-weighting, query-anchored corpus slicing).
  *
  * Plan shape at scale: one explode of the token stream, one
  * `groupBy(doc, term)` for term frequencies (map-side combined), one
  * `groupBy(term)` for document frequencies, and a broadcast of the
  * corpus-level aggregates (N, avgdl — two scalars; per-term df rides the
  * tf table). No cartesian, no driver loops; the per-doc top-k is a
  * partitioned window over the scored rows.
  *
  * Scoring runs in doubles; the standard formulas (sklearn-smoothed TF-IDF,
  * Robertson BM25 k1=1.2 b=0.75) are kept verbatim, and outputs are rounded
  * at 6 decimals for cross-engine comparison.
  */
object Ranking {

  /** Per-(doc, term) raw term counts from whitespace tokens. */
  private def termFreq(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Topic labels for ANY document grouping (k-means clusters, sources,
    * communities): per group, the top-`topN` terms by a group-level
    * TF-IDF — `n_docs(group, term) · round(ln((G+1)/gdf)·1e6)` where
    * `n_docs` counts group members CONTAINING the term (distinct per
    * doc), `gdf` the groups containing it, `G` the group count. The
    * "what is this cluster about" readout of embedding-space curation.
    *
    * Determinism: the only float is one ln over two exact integers,
    * integerized to micro-nats before the multiply — no float sum
    * anywhere. Scale shape: one distinct-term explode (corpus-linear),
    * two bounded aggregates on (group, term) / term, the 1-row group
    * count as a broadcast scalar, and a per-group ranked window —
    * everything key-partitioned, nothing pair-emitting.
    * `groups` carries (id, grp); output:
    * (grp, term, n_docs, score_micro, rank). */
  def groupTopTerms(docs: DataFrame, idCol: String, textCol: String,
      groups: DataFrame, topN: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
      .filter(col("term") =!= "")
    val gt = terms.join(groups.select(col("id"), col("grp")), "id")
      .groupBy(col("grp"), col("term")).agg(count(lit(1)).as("n_docs"))
    val gdf = gt.groupBy(col("term")).agg(count(lit(1)).as("gdf"))
    val ng = groups.agg(count_distinct(col("grp")).as("ng"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score_micro").desc, col("term").asc)
    gt.join(gdf, "term").crossJoin(broadcast(ng))
      .withColumn("score_micro", col("n_docs") * expr(
        "CAST(round(ln((CAST(ng AS DOUBLE) + 1.0) / gdf) * 1e6) AS BIGINT)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("grp"), col("term"), col("n_docs"), col("score_micro"),
        col("rank").cast("long").as("rank"))
  }

  /** Top-`topN` TF-IDF terms per document (ties: lexicographic term).
    * `idf = ln((N + 1) / (df + 1)) + 1` (sklearn smoothing — never
    * negative, never divides by zero), `score = tf * idf`.
    * Output: `(doc, term, tf, score)` with score rounded at 6 decimals. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus size rides the plan as a broadcast 1-row aggregate instead of
    // a driver collect — one less full-scan action per call (the literal
    // and the column produce the identical double arithmetic)
    val n = docs.agg(count_distinct(col(idCol)).as("nn"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("nn") + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("doc"), col("term"), col("tf"), col("rank").cast("long").as("rank"),
        round(col("score"), 6).as("score"))
  }

  /** BM25 scores for a fixed set of query terms: the top-`topN` documents
    * per term. `k1 = 1.2`, `b = 0.75`,
    * `idf = ln(1 + (N - df + 0.5) / (df + 0.5))` (Robertson; positive),
    * `score = idf * tf (k1 + 1) / (tf + k1 (1 - b + b dl / avgdl))`.
    * Document length and avgdl are whitespace token counts. */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = bm25Scored(docs, idCol, textCol, queryTerms, k1, b)
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("term"), col("doc"), col("tf"),
        col("rank").cast("long").as("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Whole-QUERY document ranking: per-doc BM25 summed over the query's
    * terms (the retrieval default), top-`topN` docs. The per-term scores
    * are integerized to a 1e-9 grid before the per-doc sum so summation
    * order cannot change the total (≤ |queryTerms| addends per doc, but
    * partial aggregation splits them nondeterministically). Output:
    * (doc, rank, score) with score rounded at 6 decimals.
    */
  def bm25DocScores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = bm25Scored(docs, idCol, textCol, queryTerms, k1, b)
    val agg = scored.groupBy(col("doc"))
      .agg(sum(round(col("score") * 1e9).cast("long")).as("s"))
    // global top-N via TakeOrdered (map-side partial top-k, no single-task
    // window over the full posting-matched doc set); the row_number window
    // then runs over topN rows only
    val top = agg.orderBy(col("s").desc, col("doc").asc).limit(topN)
    // bounded: topN rows only (explicit single-partition key)
    val w = Window.partitionBy(GlobalRank.boundedKey(col("doc")))
      .orderBy(col("s").desc, col("doc").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc"), col("rank"),
        round(col("s").cast("double") / 1e9, 6).as("score"))
  }

  /** Per-(doc, term) BM25-scored rows for `queryTerms` — the shared core
    * of [[bm25TopDocs]] (per-term ranking) and [[bm25DocScores]]
    * (per-document retrieval ranking). Columns: (term, doc, dl, tf, score).
    */
  private def bm25Scored(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double, b: Double): DataFrame = {
    val withLen = docs.select(col(idCol).as("doc"),
      col(textCol).as("text"),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    // N and Σdl in ONE aggregate that rides the plan as a broadcast 1-row
    // frame (no driver collect, no extra full-scan action); avgdl stays an
    // exact rational: sum(dl) / N in one double division (NOT a mean of
    // doubles — summation order must not matter). Long-vs-double literal
    // forms are value-identical: every integer here is < 2^53.
    val stats = withLen.agg(count(lit(1)).as("nn"), sum(col("dl")).as("sumdl"))
    val tf = withLen
      .select(col("doc"), col("dl"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("nn").cast("double") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("score",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") * col("nn") / col("sumdl").cast("double"))))
    scored
  }

  /** Reciprocal-rank fusion of bounded top-N ranked lists (the standard
    * lexical+semantic hybrid-retrieval combiner): each ranker contributes
    * `1/(kConst + rank)` for the ids it ranked; ids missing from a list
    * contribute nothing from it. Inputs are `(name, df)` pairs where each
    * df has columns (id, rank); contributions are integerized to a 1e-12
    * grid before the per-id sum (order-free with any number of rankers).
    *
    * The final global sort is a single-task window — safe because the
    * fused candidate set is bounded by Σ input list sizes (top-N lists),
    * never by corpus size. Output: (id, {name}_rank…, rank, rrf).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], kConst: Int,
      topN: Int): DataFrame = {
    val tagged = rankings.map { case (nm, df) =>
      df.select(col("id"), lit(nm).as("src"), col("rank").cast("long").as("rank"))
    }.reduce(_ unionByName _)
    val rankCols = rankings.map { case (nm, _) =>
      max(when(col("src") === nm, col("rank"))).as(s"${nm}_rank")
    }
    val sumCol = sum(round(lit(1e12) / (lit(kConst) + col("rank")))
      .cast("long")).as("s")
    val fused = tagged.groupBy(col("id")).agg(sumCol, rankCols: _*)
    // bounded: input ranking lists are bounded by contract
    val w = Window.partitionBy(GlobalRank.boundedKey(col("id")))
      .orderBy(col("s").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .withColumn("rrf", round(col("s").cast("double") / 1e12, 6))
      .drop("s")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): corpus-level
    * salient terms as the PageRank of the word co-occurrence graph —
    * unlike raw frequency, a term ranks high when it co-occurs with OTHER
    * well-connected terms, which is what separates topical vocabulary
    * from boilerplate fill.
    *
    * Graph: adjacent whitespace-token pairs (window 1) across all docs,
    * symmetrized and deduped; nodes are the shared deterministic char
    * hash of the term ([[graft.functions.HashExprs]] — collisions merge
    * words identically in both engines, so parity holds by construction).
    * Ranks come from [[Graph.pageRank]] verbatim (integer-exact damped
    * rounds; every node of the symmetric graph has an out-edge, so the
    * default no-dangling mode applies); terms map back by min-word per
    * hash and the top `topN` emit (term, rank_scaled, rank).
    *
    * Scale shape: the edge list is bounded by total token count (window
    * 1), the pagerank loop inherits pageRank's shape, and the final
    * global top-N is a TakeOrdered over node-grain rows. */
  def textrankKeywords(docs: DataFrame, idCol: String, textCol: String,
      iters: Int, topN: Int): DataFrame = {
    import graft.functions.HashExprs
    val bg = docs
      .select(split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(tk) - 1),
          |  i -> named_struct('w1', element_at(tk, i),
          |                    'w2', element_at(tk, i + 1)))""".stripMargin))
        .as("z"))
      .select(col("z.w1").as("w1"), col("z.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "" && col("w1") =!= col("w2"))
    val hashed = bg.select(
        expr(HashExprs.sparkCharHash("w1")).as("a"),
        expr(HashExprs.sparkCharHash("w2")).as("b"))
    val edges = hashed.select(col("a").as("src"), col("b").as("dst"))
      .union(hashed.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    val ranks = Graph.pageRank(edges, iters, edgesDistinct = true,
      broadcastRank = true)
    val words = docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("term"), expr(HashExprs.sparkCharHash("term")).as("id"))
      .groupBy(col("id")).agg(min(col("term")).as("term"))
    val out = ranks.join(words, Seq("id"))
      .select(col("term"), col("rank").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("term").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(
        // bounded: topN rows only
        Window.partitionBy(GlobalRank.boundedKey(col("term")))
          .orderBy(col("rank_scaled").desc, col("term").asc)).cast("long"))
    val r = out.localCheckpoint()
    Checkpoints.release(ranks)
    r
  }
}
