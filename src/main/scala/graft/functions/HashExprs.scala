package graft.functions

/** Shared integer-hash building blocks for the dedup / text-analysis
  * operators, emitted in BOTH dialects: Spark SQL expression strings (for
  * `expr(...)` — stays inside Catalyst codegen, no UDFs) and DuckDB SQL (for
  * the oracle). Everything is exact 64-bit integer arithmetic mod a prime, so
  * the driver's hash compare is bit-exact by construction.
  *
  * The polynomial hash (base 31 mod 1e9+7) is the classic Rabin-Karp rolling
  * hash. For the 100 TB path, swap `sparkWordHashes` for the xxhash64-based
  * variant in [[graft.operators.Dedup.minhashCandidatesXx]] — same plan
  * shape, native codegen'd hash, no oracle (DuckDB can't replicate xxhash64).
  */
object HashExprs {
  val P = 1000000007L
  val NumPerm = 32
  val Bands = 8
  val RowsPerBand = 4
  require(Bands * RowsPerBand == NumPerm)

  /** Deterministic (a, b) pairs for the minhash permutations
    * h_i(x) = (a_i * x + b_i) mod P. Knuth multiplicative constants. */
  val perms: Seq[(Long, Long)] = (0 until NumPerm).map { i =>
    val a = (2654435761L * (2 * i + 3)) % P
    val b = (40503L * (i + 7) % P * 2654435761L) % P
    (if (a == 0) 1L else a, b)
  }

  // ---------------------------------------------------------------- Spark
  /** chars of `s` -> polynomial hash (BIGINT). */
  def sparkCharHash(s: String): String =
    s"aggregate(split($s, ''), 0L, (acc, ch) -> (acc * 31 + ascii(ch)) % $P)"

  /** text -> array of per-word hashes (whitespace tokens, in order). */
  def sparkWordHashes(text: String): String =
    s"transform(split($text, ' '), w -> ${sparkCharHash("w")})"

  /** word-hash array -> distinct 3-shingle hashes (empty if < 3 words). */
  def sparkShingles(wh: String): String =
    s"""CASE WHEN size($wh) >= 3 THEN array_distinct(transform(
       |  sequence(0, size($wh) - 3),
       |  i -> ((element_at($wh, i+1) * 31 + element_at($wh, i+2)) % $P * 31
       |        + element_at($wh, i+3)) % $P))
       |ELSE array(CAST(NULL AS BIGINT)) END""".stripMargin

  /** shingle array -> minhash signature (array of NumPerm BIGINTs). */
  def sparkMinhash(sh: String): String =
    "array(" + perms.map { case (a, b) =>
      s"array_min(transform($sh, h -> ($a * h + $b) % $P))"
    }.mkString(",\n      ") + ")"

  /** signature array -> LSH band keys; the band index is mixed in so equal
    * hashes in different band positions never collide. */
  def sparkBands(mh: String): String = {
    val bands = (0 until Bands).map { j =>
      val base = j * RowsPerBand
      val combined = (1 until RowsPerBand).foldLeft(
        s"element_at($mh, ${base + 1})") { (acc, r) =>
        s"($acc * 31 + element_at($mh, ${base + r + 1})) % $P"
      }
      s"$combined * $Bands + $j"
    }
    "array(" + bands.mkString(",\n      ") + ")"
  }

  /** SimHash configuration: 30 usable bits (hashes live mod P < 2^30),
    * banded into 5 six-bit chunks. Pigeonhole: any pair within Hamming
    * distance 4 shares at least one unchanged chunk, so chunk-equality
    * candidates are COMPLETE for ham<=4 — banding is a pure speedup, not an
    * approximation. */
  val SimhashBits = 30
  val SimhashChunks = 5
  val SimhashChunkBits = 6
  val SimhashMaxHamming = 4

  /** simhash over a hash-array column: bit b of the fingerprint is the
    * majority vote of bit b across the array's hashes. */
  def sparkSimhash(arr: String): String =
    s"""aggregate(sequence(0, ${SimhashBits - 1}), 0L, (acc, b) ->
       |  acc + IF(2 * size(filter($arr, h -> (h div shiftleft(1L, b)) % 2 = 1))
       |           > size($arr), shiftleft(1L, b), 0L))""".stripMargin

  /** fingerprint -> array of banded chunk keys (chunk index mixed in). */
  def sparkSimhashChunks(f: String): String =
    "array(" + (0 until SimhashChunks).map { j =>
      s"((($f div ${1L << (j * SimhashChunkBits)}) % ${1L << SimhashChunkBits}) * $SimhashChunks + $j)"
    }.mkString(", ") + ")"

  // --------------------------------------------------------------- DuckDB
  def duckCharHash(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($s, ''), ch -> ascii(ch)::BIGINT)), (acc, x) -> (acc * 31 + x) % $P)"

  def duckWordHashes(text: String): String =
    s"list_transform(string_split($text, ' '), w -> ${duckCharHash("w")})"

  def duckShingles(wh: String): String =
    s"""CASE WHEN len($wh) >= 3 THEN list_distinct(list_transform(
       |  range(0, len($wh) - 2),
       |  i -> (($wh[i+1] * 31 + $wh[i+2]) % $P * 31 + $wh[i+3]) % $P))
       |ELSE [NULL::BIGINT] END""".stripMargin

  def duckMinhash(sh: String): String =
    "[" + perms.map { case (a, b) =>
      s"list_min(list_transform($sh, h -> ($a * h + $b) % $P))"
    }.mkString(",\n      ") + "]"

  def duckBands(mh: String): String = {
    val bands = (0 until Bands).map { j =>
      val base = j * RowsPerBand
      val combined = (1 until RowsPerBand).foldLeft(s"$mh[${base + 1}]") {
        (acc, r) => s"($acc * 31 + $mh[${base + r + 1}]) % $P"
      }
      s"$combined * $Bands + $j"
    }
    "[" + bands.mkString(",\n      ") + "]"
  }

  def duckSimhash(arr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $SimhashBits), b ->
       |  CASE WHEN 2 * len(list_filter($arr, h -> (h // (1::BIGINT << b)) % 2 = 1))
       |            > len($arr) THEN (1::BIGINT << b) ELSE 0::BIGINT END)),
       |  (acc, x) -> acc + x)""".stripMargin

  def duckSimhashChunks(f: String): String =
    "[" + (0 until SimhashChunks).map { j =>
      s"((($f // ${1L << (j * SimhashChunkBits)}) % ${1L << SimhashChunkBits}) * $SimhashChunks + $j)"
    }.mkString(", ") + "]"
}
