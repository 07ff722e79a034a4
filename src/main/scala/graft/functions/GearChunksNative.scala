package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunking (gear-hash CDC,
  * the FastCDC/rsync family) of a string into variable-size chunks whose
  * boundaries depend only on LOCAL content — so an insertion or deletion
  * re-synchronizes within one chunk and shared passages collapse to
  * identical chunks corpus-wide. The storage/passage-dedup primitive a
  * 100 TB blob pipeline runs before anything expensive sees the bytes.
  *
  * Walk: `h = h·2 + gear(c)` over 64-bit wrapping arithmetic with
  * `gear(c) = (c + 1) · 0x9E3779B97F4A7C15`, cut after a char when the
  * chunk has ≥ `minLen` chars and the low `maskBits` bits of `h` are
  * zero, or unconditionally at `maxLen`; `h` resets at each cut. The
  * recurrence is mirrored step-for-step by a recursive CTE in the DuckDB
  * oracle (HUGEINT mod-2^64 arithmetic ≡ Long wrapping), so a drift in
  * the gear constant, the mask check, or the reset discipline breaks the
  * correctness hash. Chars are UTF-16 units (= codepoints for the ASCII
  * corpus; astral-plane text would chunk differently than the oracle's
  * codepoint walk — same BMP caveat as JaroWinkler).
  *
  * Scale shape: document grain, O(len) per row, no state outside the
  * row — rides the scan partitioning like every per-doc kernel.
  */
case class GearChunks(child: Expression, maskBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 30, "maskBits in [1,30]")
  require(minLen >= 1 && maxLen >= minLen, "1 <= minLen <= maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gear_chunks needs a string arg, got ${child.dataType}")
  }

  override def nullSafeEval(s: Any): Any =
    GearChunksImpl.chunks(s.asInstanceOf[UTF8String].toString,
      maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearChunksImpl.chunks($c.toString(), $maskBits, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunksImpl {
  /** Gear multiplier: the 64-bit golden-ratio constant (splitmix64's
    * increment) — any fixed odd constant works; this one is mirrored in
    * the oracle as unsigned 11400714819323198485. */
  val Golden: Long = 0x9E3779B97F4A7C15L

  /** The per-row kernel — one static method shared by the interpreted
    * and generated paths. */
  def chunks(text: String, maskBits: Int, minLen: Int,
      maxLen: Int): ArrayData = {
    val n = text.length
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var h = 0L
    var clen = 0
    var i = 0
    while (i < n) {
      h = h * 2L + (text.charAt(i).toLong + 1L) * Golden
      clen += 1
      if ((clen >= minLen && (h & mask) == 0L) || clen == maxLen) {
        out += UTF8String.fromString(text.substring(start, i + 1))
        start = i + 1; h = 0L; clen = 0
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(text.substring(start))
    new GenericArrayData(out.toArray[Any])
  }
}

object GearChunksNative {
  /** Column-level API: `gearChunks($"text", 5, 16, 64)`. */
  def gearChunks(text: Column, maskBits: Int, minLen: Int,
      maxLen: Int): Column =
    GraftColumnBridge.column(
      GearChunks(GraftColumnBridge.expression(text), maskBits, minLen,
        maxLen))
}
