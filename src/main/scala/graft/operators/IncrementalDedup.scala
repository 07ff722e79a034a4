package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashNative
import graft.functions.HashExprs.sparkBands

/** Incremental near-duplicate detection against a PERSISTED fingerprint
  * index — the production dedup loop: a daily batch must be checked against
  * a 100 TB corpus without touching the corpus text again.
  *
  * The index is two parquet tables under `indexDir`:
  *   - `bands/`    (id, bv): the LSH band keys of every indexed document;
  *   - `shingles/` (id, sh): the shingle-hash arrays, kept for the exact
  *     Jaccard verification of future candidates.
  *
  * Per batch: candidates = batch bands equi-joined against (index ∪ batch)
  * bands — every candidate touches the new batch by construction, so
  * already-reported old×old pairs never re-emit; verification joins the
  * candidate ids back to the stored shingle arrays; then the batch's bands
  * and shingles APPEND to the index. Costs scale with
  * `|batch| x band-collision rate`, never with corpus size: the corpus
  * contributes only the (id, bv) rows whose band keys the batch actually
  * hits (a broadcast-able sliver after the equi-join), and corpus text is
  * never re-read.
  *
  * The union of `processBatch` outputs over any batch partitioning of a
  * corpus equals [[Dedup.minhashNearDups]] on the whole corpus (same bands,
  * same verification; pairs oriented (min, max) — spec-checked).
  */
object IncrementalDedup {

  /** Dedup `batch` against the index at `indexDir` (and itself), then add
    * the batch to the index. Returns verified near-dup pairs
    * `(id_a < id_b)` where at least one side is from `batch`.
    *
    * OWNERSHIP: the returned frame is checkpoint-persisted (the result
    * must be frozen before the index append, see below); the caller owns
    * its lifecycle and releases it with [[Checkpoints.release]] when done
    * (`unpersist()` cannot see checkpoint blocks). */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, num: Int = 7, den: Int = 10): DataFrame = {
    val spark = batch.sparkSession
    val bandsPath = s"${indexDir.stripSuffix("/")}/bands"
    val shPath = s"${indexDir.stripSuffix("/")}/shingles"

    val sh = Dedup.shingleTable(batch, idCol, textCol).persist()
    val bands = sh
      .select(col("id"), HashNative.minhashSig(col("sh")).as("mh"))
      .select(col("id"), explode(expr(sparkBands("mh"))).as("bv"))
      .persist()

    def existing(path: String, like: DataFrame): DataFrame = {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(path) else like.limit(0)
    }
    val oldBands = existing(bandsPath, bands)
    val oldSh = existing(shPath, sh)

    // one side restricted to the batch => every pair touches new data;
    // (min, max) orientation dedups the symmetric matches
    val cand = bands.as("a")
      .join(oldBands.unionByName(bands).as("b"),
        col("a.bv") === col("b.bv") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val allSh = oldSh.unionByName(sh)
    val pairs = cand
      .join(allSh.select(col("id"), col("sh").as("sa")), cand("id_a") === col("id"))
      .drop("id")
      .join(allSh.select(col("id"), col("sh").as("sb")), cand("id_b") === col("id"))
      .filter(Dedup.jaccardGe(num, den))
      .select(col("id_a"), col("id_b"))
      // EAGER materialization that cuts the plan, not a persist(): the
      // result must be frozen BEFORE the appends below extend the index —
      // a cached plan would silently re-COMPILE when its parent caches
      // unpersist (non-cascading invalidation re-resolves the relation),
      // re-list the index with this batch's own rows now present, and
      // return duplicated pairs
      .localCheckpoint()

    bands.write.mode("append").parquet(bandsPath)
    sh.write.mode("append").parquet(shPath)
    sh.unpersist(); bands.unpersist()
    pairs
  }
}
