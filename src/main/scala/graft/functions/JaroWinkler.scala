package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two strings as a
  * double in [0, 1] — the record-linkage scorer that, unlike Levenshtein,
  * rewards shared prefixes and tolerates transpositions (names, titles,
  * addresses). Spark ships no Jaro function; this one participates in
  * whole-stage codegen through one static-call site (the per-row loop lives
  * in [[JaroWinklerImpl]] — a primitive char-array walk, no boxing).
  *
  * Semantics are the STANDARD definition, verified char-for-char against
  * DuckDB's `jaro_winkler_similarity` (the oracle): match window
  * `max(len)/2 − 1`, greedy leftmost matching, half-transposition count,
  * Winkler prefix bonus `l·0.1·(1−J)` with `l ≤ 4` applied only when the
  * Jaro score exceeds the 0.7 boost threshold (probed: DuckDB applies no
  * bonus at J ≤ 0.7). Double arithmetic is the same
  * divide-each-then-sum-then-divide order, so micro-rounded scores
  * hash-match. Comparison is per UTF-16 char (= per codepoint for BMP
  * text; the engines could diverge on astral-plane codepoints).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two string args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jw($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerImpl {
  /** The per-row kernel — kept in one static method so the interpreted
    * path and generated code share bit-identical arithmetic. */
  def jw(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val bMatched = new Array[Boolean](lb)
    val aMatched = new Array[Char](math.min(la, lb))
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a.charAt(i)
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && ca == b.charAt(j)) {
          bMatched(j) = true
          aMatched(m) = ca
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    var j2 = 0
    while (k < m) {
      while (!bMatched(j2)) j2 += 1
      if (aMatched(k) != b.charAt(j2)) t += 1
      j2 += 1
      k += 1
    }
    val half = t / 2
    val j = (m.toDouble / la + m.toDouble / lb +
      (m - half).toDouble / m) / 3.0
    if (j > 0.7) {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

object JaroWinkler {
  /** Column-level API: `jaroWinkler($"a", $"b")`. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerSim(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
