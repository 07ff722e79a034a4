package graft.functions

/** Z-order (Morton) interleaving for multi-dimensional data layout, emitted
  * in both SQL dialects from one bit-spreading recipe (same shared-constant
  * pattern as [[HashExprs]]).
  *
  * `morton2(x, y)` interleaves the low 31 bits of two non-negative BIGINTs
  * (x in even bit positions, y in odd) via the standard magic-number spread
  * — five mask-and-shift steps, all plain integer ops, codegen'd end to end.
  * Sorting by the interleaved key clusters rows so that a range predicate on
  * EITHER dimension (or a box on both) touches a bounded run of files: the
  * min/max footer stats of a z-ordered layout cut both dimensions at once,
  * where a linear sort only ever cuts its leading column. This is the
  * standard lakehouse data-skipping layout (Delta/Iceberg `ZORDER BY`),
  * reproduced here as a pure expression + range-partitioned sorted write.
  */
object ZOrderExprs {

  /** The five (shift, mask) spread steps: after them a 31-bit value's bits
    * sit in the even positions of a 62-bit value. */
  private val steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Bit-spread `v`'s low 31 bits into even positions. `shl(e, n)` spells a
    * left shift in the target dialect; `&` and `|` are shared operators.
    * The seed casts to BIGINT explicitly: for an int32 column Spark's
    * shiftleft stays in 32-bit arithmetic and the first spread step would
    * wrap before the 64-bit masks apply (values >= 2^15 corrupt silently). */
  private def spread(v: String, shl: (String, Int) => String,
      toBigint: String => String): String =
    steps.foldLeft(s"(${toBigint(v)} & 2147483647)") { case (acc, (sh, mask)) =>
      s"(($acc | ${shl(acc, sh)}) & $mask)"
    }

  // ---------------------------------------------------------------- Spark
  /** Spark SQL expr: morton code of two non-negative int/long columns.
    * The two spread values occupy disjoint bit sets, so `|` merges them. */
  def sparkMorton2(x: String, y: String): String = {
    val shl = (e: String, n: Int) => s"shiftleft($e, $n)"
    val big = (e: String) => s"CAST($e AS BIGINT)"
    s"(${spread(x, shl, big)} | shiftleft(${spread(y, shl, big)}, 1))"
  }

  // --------------------------------------------------------------- DuckDB
  def duckMorton2(x: String, y: String): String = {
    val shl = (e: String, n: Int) => s"($e << $n)"
    val big = (e: String) => s"CAST($e AS BIGINT)"
    s"(${spread(x, shl, big)} | (${spread(y, shl, big)} << 1))"
  }
}
