package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: longest-common-subsequence LENGTH of two
  * token sequences (arrays of strings) — the per-document kernel behind
  * ROUGE-L (Lin 2004). O(n·m) two-row dynamic program over primitive int
  * arrays; tokens compare as raw UTF-8 bytes (`UTF8String.equals`), no
  * String materialization. Participates in whole-stage codegen through one
  * static-call site, same discipline as [[JaroWinklerImpl]].
  *
  * Scale shape: per-row compute bounded by the two token counts (document
  * grain — no corpus-grain state), embarrassingly parallel across rows, so
  * the operator rides whatever partitioning the scan has. Null ELEMENTS
  * match nothing (a null token never equals anything, including another
  * null); null ARRAYS null the result via the standard BinaryExpression
  * contract.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    def isStrArr(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (isStrArr(left.dataType) && isStrArr(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lcs_length needs two array<string> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsImpl.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsImpl.lcs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsImpl {
  /** The per-row kernel — one static method so the interpreted path and
    * generated code share the exact same arithmetic. */
  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    // fetch each side once (getUTF8String per DP cell would re-decode the
    // array header m times per row of the DP)
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i); i += 1 }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      val ai = as(i)
      j = 1
      while (j <= m) {
        val bj = bs(j - 1)
        cur(j) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(cur(j - 1), prev(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }
}

object LcsNative {
  /** Column-level API: `lcsLength($"candTokens", $"refTokens")`. */
  def lcsLength(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LcsLength(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
