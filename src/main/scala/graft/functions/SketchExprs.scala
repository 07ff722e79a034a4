package graft.functions

/** Count-Min sketch building blocks, emitted in both dialects (Spark SQL
  * expression strings and DuckDB SQL) from ONE set of constants — the same
  * shared-constant pattern as [[HashExprs]], so the DuckDB oracle runs the
  * identical algorithm and the driver's hash compare is bit-exact.
  *
  * The sketch is a `Depth x Width` counter matrix represented as a TABLE
  * `(ri, bucket, cnt)` rather than driver-side state: each input row emits
  * `Depth` (row, bucket) cells, one `groupBy(ri, bucket).count` builds every
  * counter in a single distributed aggregate (map-side partial merge, at
  * most `Depth * Width` final rows regardless of input size), and point
  * estimates are a join + `min(cnt)`. CMS invariants: estimates never
  * undercount, and overcount is bounded by `e * n / Width` with probability
  * `1 - exp(-Depth)` — checked as a boolean column in the oracle query.
  *
  * Keys must already be non-negative BIGINTs below [[HashExprs.P]] (hash
  * strings with [[HashExprs.sparkCharHash]] first; reduce ids mod P). The
  * row hashes are the classic `h_i(x) = ((a_i x + b_i) mod P) mod W` with
  * Knuth multiplicative constants: `a_i < P` and `x < P` keep the product
  * under 2^63, so the arithmetic never overflows in either engine.
  */
object SketchExprs {
  val P: Long = HashExprs.P
  val Depth = 4
  val Width = 64

  /** Deterministic (a, b) per sketch row — distinct from the minhash perms
    * (different stride) so the two sketch families never alias. */
  val rowHashes: Seq[(Long, Long)] = (0 until Depth).map { i =>
    val a = (2654435761L * (2 * i + 11)) % P
    val b = (40503L * (i + 13) % P * 2654435761L) % P
    (if (a == 0) 1L else a, b)
  }

  // ---------------------------------------------------------------- Spark
  /** key expr -> array of Depth (ri, bucket) structs, for one explode. */
  def sparkCmsCells(k: String): String =
    "array(" + rowHashes.zipWithIndex.map { case ((a, b), i) =>
      s"struct(${i}L AS ri, (($a * $k + $b) % $P) % $Width AS bucket)"
    }.mkString(",\n      ") + ")"

  /** per-row bucket expr for sketch row `i` (probe side). */
  def sparkBucket(i: Int, k: String): String = {
    val (a, b) = rowHashes(i)
    s"(($a * $k + $b) % $P) % $Width"
  }

  // --------------------------------------------------------------- DuckDB
  def duckBucket(i: Int, k: String): String = {
    val (a, b) = rowHashes(i)
    s"(($a * $k + $b) % $P) % $Width"
  }

  /** The sketch-table CTE body: Depth UNION ALL'd grouped counts over
    * `table` keyed by `k` (same counters the Spark build produces). */
  def duckCmsTable(table: String, k: String): String =
    (0 until Depth).map { i =>
      s"SELECT $i AS ri, ${duckBucket(i, k)} AS bucket, count(*) AS cnt FROM $table GROUP BY 2"
    }.mkString("\n  UNION ALL ")

  /** Probe rows for a key expr: Depth (ri, bucket) rows per source row. */
  def duckProbeCells(k: String): String =
    "[" + rowHashes.indices.map { i =>
      s"struct_pack(ri := $i, bucket := ${duckBucket(i, k)})"
    }.mkString(", ") + "]"
}
