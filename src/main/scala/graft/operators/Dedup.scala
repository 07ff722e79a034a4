package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashExprs._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale design notes (the point of each variant):
  *  - `exact`: one hash-shuffle on the key; map-side partial aggregation
  *    makes this the cheapest possible full-corpus dedup.
  *  - `minhashNearDups`: the 100 TB path. Candidate generation is
  *    shuffle-on-band-key (each doc emits `Bands` short keys), so the
  *    quadratic all-pairs comparison collapses to per-bucket joins; exact
  *    Jaccard verification runs only on candidates. No driver-side state.
  *  - `ngramNearDups`: brute-force all-pairs verification — quadratic;
  *    correctness baseline for small corpora and the verifier of the LSH
  *    variant's recall in tests.
  *  - `simhashNearDups`: constant-size fingerprint (single long), candidate
  *    filter by Hamming distance, verified by token Jaccard.
  *
  * All hashes are exact integer arithmetic (see [[graft.functions.HashExprs]])
  * so results are engine-independent and oracle-checkable.
  */
object Dedup {

  /** Exact dedup: one surviving id per distinct key, plus multiplicity. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("copies"))

  /** id -> distinct word-3-shingle hash array. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        expr(sparkWordHashes(textCol)).as("wh"))
      .select(col("id"), expr(sparkShingles("wh")).as("sh"))

  /** Jaccard(a, b) >= num/den as pure integer comparison. */
  private def jaccardGe(num: Int, den: Int) = {
    val inter = size(array_intersect(col("sa"), col("sb")))
    val union = size(col("sa")) + size(col("sb")) - inter
    inter * den >= union * num
  }

  /** MinHash+LSH near-duplicate pairs (id_a < id_b), verified by exact
    * shingle Jaccard >= num/den. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      num: Int = 7, den: Int = 10): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol)
    val bands = sh
      .select(col("id"), expr(sparkMinhash("sh")).as("mh"))
      .select(col("id"), explode(expr(sparkBands("mh"))).as("bv"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bv") === col("b.bv") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id"), col("sh").as("sa")), cand("id_a") === col("id"))
      .drop("id")
      .join(sh.select(col("id"), col("sh").as("sb")), cand("id_b") === col("id"))
      .filter(jaccardGe(num, den))
      .select(col("id_a"), col("id_b"))
  }

  /** Brute-force n-gram Jaccard near-dup pairs — quadratic baseline. */
  def ngramNearDups(docs: DataFrame, idCol: String, textCol: String,
      num: Int = 7, den: Int = 10): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol)
    sh.select(col("id").as("id_a"), col("sh").as("sa"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sb")),
        col("id_a") < col("id_b"))
      .filter(jaccardGe(num, den))
      .select(col("id_a"), col("id_b"))
  }

  /** id -> 16-bit simhash fingerprint over frequency-weighted word hashes. */
  def simhashFingerprints(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        expr(sparkWordHashes(textCol)).as("wh"))
      .select(col("id"), expr(sparkSimhash("wh")).as("simhash"))

  /** SimHash candidate pairs within `maxHamming`, verified by distinct-token
    * Jaccard >= num/den. The Hamming prefilter is what scales: fingerprints
    * are single longs, so the candidate join is tiny compared to shingle
    * arrays. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 2, num: Int = 1, den: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
        expr(sparkWordHashes(textCol)).as("whf"))
      .select(col("id"), array_distinct(col("whf")).as("wh"),
        expr(sparkSimhash("whf")).as("f"))
    val pairs = base.select(col("id").as("id_a"), col("wh").as("sa"), col("f").as("fa"))
      .join(base.select(col("id").as("id_b"), col("wh").as("sb"), col("f").as("fb")),
        col("id_a") < col("id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= maxHamming)
      .filter(jaccardGe(num, den))
    pairs.select(col("id_a"), col("id_b"))
  }

  /** Scale-path MinHash candidates using Spark's native xxhash64 for word
    * hashing — same plan shape as [[minhashNearDups]] with a cheaper,
    * codegen'd hash. Not oracle-checkable (DuckDB has no xxhash64); benched
    * and recall-tested against [[ngramNearDups]] in the test suite. */
  def minhashCandidatesXx(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // pmod keeps hashes inside the prime field (ANSI mode would overflow
    // on 64-bit products otherwise)
    val sh = docs.select(col(idCol).as("id"),
        expr(s"transform(split($textCol, ' '), w -> pmod(xxhash64(w), ${graft.functions.HashExprs.P}))").as("wh"))
      .select(col("id"), expr(sparkShingles("wh")).as("sh"))
    val bands = sh
      .select(col("id"), expr(sparkMinhash("sh")).as("mh"))
      .select(col("id"), explode(expr(sparkBands("mh"))).as("bv"))
    bands.as("a")
      .join(bands.as("b"), col("a.bv") === col("b.bv") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }
}
