package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WORD-level Levenshtein edit distance of two
  * token sequences (arrays of strings) — the per-document kernel behind
  * TER (translation edit rate, Snover et al. 2006, shift-less variant).
  * Spark's built-in `levenshtein` is character-level over one string;
  * eval metrics need token-level distance, and hashing words down to
  * characters to reuse it would alias distinct words. O(n·m) two-row
  * dynamic program over primitive int arrays; tokens compare as raw
  * UTF-8 bytes (`UTF8String.equals`), no String materialization.
  * Participates in whole-stage codegen through one static call site, same
  * discipline as [[LcsLength]].
  *
  * Scale shape: per-row compute bounded by the two token counts (document
  * grain — no corpus-grain state), embarrassingly parallel across rows.
  * Null ELEMENTS match nothing (a null token never equals anything,
  * including another null); null ARRAYS null the result via the standard
  * BinaryExpression contract.
  */
case class WordEditDistance(left: Expression, right: Expression)
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
        s"word_edit_distance needs two array<string> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistImpl.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistImpl.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordEditDistance =
    copy(left = newLeft, right = newRight)
}

object EditDistImpl {
  /** The per-row kernel — one static method so the interpreted path and
    * generated code share the exact same arithmetic. Unit costs for
    * insert/delete/substitute (the TER convention). */
  def dist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = if (a.isNullAt(i)) null else a.getUTF8String(i); i += 1 }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    i = 1
    while (i <= n) {
      val ai = as(i - 1)
      cur(0) = i
      j = 1
      while (j <= m) {
        val bj = bs(j - 1)
        val cost = if (ai != null && bj != null && ai.equals(bj)) 0 else 1
        var v = prev(j - 1) + cost       // substitute / match
        val del = prev(j) + 1            // delete from candidate
        if (del < v) v = del
        val ins = cur(j - 1) + 1         // insert into candidate
        if (ins < v) v = ins
        cur(j) = v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }
}

object EditDistNative {
  /** Column-level API: `wordEditDistance($"candTokens", $"refTokens")`. */
  def wordEditDistance(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      WordEditDistance(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
