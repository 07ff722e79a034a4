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

  /** 16-bit simhash over the (frequency-weighted) word-hash array. */
  def sparkSimhash(wh: String): String =
    s"""aggregate(sequence(0, 15), 0L, (acc, b) ->
       |  acc + IF(2 * size(filter($wh, h -> (h div shiftleft(1L, b)) % 2 = 1))
       |           > size($wh), shiftleft(1L, b), 0L))""".stripMargin

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

  def duckSimhash(wh: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 16), b ->
       |  CASE WHEN 2 * len(list_filter($wh, h -> (h // (1::BIGINT << b)) % 2 = 1))
       |            > len($wh) THEN (1::BIGINT << b) ELSE 0::BIGINT END)),
       |  (acc, x) -> acc + x)""".stripMargin
}
