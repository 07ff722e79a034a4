package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking dedup — the storage/passage-level dedup
  * family next to the document-level MinHash/SimHash and the span-level
  * ExactSubstr scrub: gear-hash CDC ([[graft.functions.GearChunks]])
  * splits every document into content-addressed variable-size chunks,
  * and duplicated chunks (same text in ≥ 2 distinct documents) roll up
  * to a per-document duplication scorecard. Because boundaries are
  * content-defined, an edit anywhere re-synchronizes within one chunk,
  * so shared passages land as byte-identical chunks no matter where
  * they sit in each document — the property rsync/FastCDC/venti built
  * storage dedup on, and the scalable way to find boilerplate passages
  * at 100 TB.
  *
  * Scale shape: one corpus scan → per-doc O(len) chunking (document
  * grain, no corpus state) → chunk-grain exchange for the duplicate
  * count → doc-grain rollup. The chunk groupBy keys on the chunk TEXT
  * here (exact, oracle-mirrorable); a 100 TB deployment would key the
  * exchange on a 128-bit chunk digest and keep text only for verify —
  * same plan shape, narrower shuffle rows.
  */
object Chunking {

  /** Per-document CDC duplication report:
    * (id, n_chunks, chars_total, dup_chars, dup_frac_micro) where
    * dup_chars sums the lengths of this doc's chunks whose text appears
    * in ≥ 2 distinct documents; docs that produce no chunks (empty
    * text) keep their row with NULL dup_frac_micro. */
  def cdcDedupReport(df: DataFrame, idCol: String, textCol: String,
      maskBits: Int = 5, minLen: Int = 16, maxLen: Int = 64): DataFrame = {
    val chunks = df
      .select(col(idCol).as("id"),
        explode(graft.functions.GearChunksNative.gearChunks(
          col(textCol), maskBits, minLen, maxLen)).as("chunk"))
    val nDocs = chunks.select(col("id"), col("chunk")).distinct()
      .groupBy(col("chunk")).agg(count(lit(1)).as("ndocs"))
    val perDoc = chunks.join(nDocs, Seq("chunk"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(length(col("chunk"))).cast("long").as("chars_total"),
        sum(when(col("ndocs") >= 2, length(col("chunk")))
          .otherwise(lit(0))).cast("long").as("dup_chars"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("chars_total"), lit(0L)).as("chars_total"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        expr("""CASE WHEN coalesce(chars_total, 0) = 0
               |  THEN CAST(NULL AS BIGINT)
               |ELSE CAST(round(1e6 * CAST(dup_chars AS DOUBLE)
               |  / chars_total) AS BIGINT) END""".stripMargin)
          .as("dup_frac_micro"))
  }

  /** DuckDB replica of [[cdcDedupReport]]. `docsCte` must define
    * `cdcdocs(id, text)`. The gear walk is replayed per character as a
    * recursive CTE over (h, clen, cut) state — HUGEINT mod-2^64
    * arithmetic is congruent to the kernel's wrapping Long — and chunks
    * re-materialize from the cut positions with one lead() window. */
  def cdcOracleSql(docsCte: String, maskBits: Int = 5, minLen: Int = 16,
      maxLen: Int = 64): String = {
    val m = BigInt(2).pow(64).toString
    val gearMod = s"((ord(substr(d2.text, CAST(s.i + 1 AS INTEGER), 1)) + 1)" +
      s" * 11400714819323198485::HUGEINT) % $m::HUGEINT"
    s"""WITH RECURSIVE $docsCte,
       |dl AS MATERIALIZED (
       |  SELECT id, text, CAST(length(text) AS BIGINT) AS n FROM cdcdocs),
       |st AS (
       |  SELECT id, CAST(0 AS BIGINT) AS i, CAST(0 AS HUGEINT) AS h,
       |         CAST(0 AS BIGINT) AS clen, FALSE AS cut
       |  FROM dl
       |  UNION ALL
       |  SELECT id, i, h, clen,
       |         (clen >= $minLen AND h % ${1L << maskBits} = 0)
       |           OR clen = $maxLen AS cut
       |  FROM (
       |    SELECT s.id, s.i + 1 AS i,
       |           CASE WHEN s.cut THEN $gearMod
       |                ELSE (s.h * 2 + $gearMod) % $m::HUGEINT END AS h,
       |           CASE WHEN s.cut THEN 1 ELSE s.clen + 1 END AS clen
       |    FROM st s JOIN dl d2 ON d2.id = s.id
       |    WHERE s.i < d2.n) x),
       |cuts AS MATERIALIZED (SELECT id, i AS cut FROM st WHERE cut),
       |bnds AS (SELECT id, CAST(0 AS BIGINT) AS s FROM dl
       |         UNION ALL SELECT id, cut FROM cuts),
       |ch AS MATERIALIZED (
       |  SELECT b.id,
       |         substr(d2.text, CAST(b.s + 1 AS INTEGER),
       |           CAST(coalesce(lead(b.s) OVER (PARTITION BY b.id
       |             ORDER BY b.s), d2.n) - b.s AS INTEGER)) AS chunk
       |  FROM bnds b JOIN dl d2 ON d2.id = b.id),
       |chnz AS MATERIALIZED (SELECT id, chunk FROM ch WHERE chunk <> ''),
       |nd AS MATERIALIZED (
       |  SELECT chunk, count(*) AS ndocs
       |  FROM (SELECT DISTINCT id, chunk FROM chnz) GROUP BY 1),
       |agg AS (
       |  SELECT c.id, CAST(count(*) AS BIGINT) AS n_chunks,
       |         CAST(sum(length(c.chunk)) AS BIGINT) AS chars_total,
       |         CAST(sum(CASE WHEN nd.ndocs >= 2 THEN length(c.chunk)
       |           ELSE 0 END) AS BIGINT) AS dup_chars
       |  FROM chnz c JOIN nd ON nd.chunk = c.chunk
       |  GROUP BY 1)
       |SELECT d.id,
       |  CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
       |  CAST(coalesce(a.chars_total, 0) AS BIGINT) AS chars_total,
       |  CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars,
       |  CASE WHEN coalesce(a.chars_total, 0) = 0
       |    THEN CAST(NULL AS BIGINT)
       |  ELSE CAST(round(1e6 * CAST(a.dup_chars AS DOUBLE)
       |    / a.chars_total) AS BIGINT) END AS dup_frac_micro
       |FROM dl d LEFT JOIN agg a ON a.id = d.id""".stripMargin
  }
}
