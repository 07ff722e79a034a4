package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL n-grams of orders 1..maxN over a dense
  * token array, as one `array<struct<n:int, g:string>>` — the per-row gram
  * generator of the eval-metric family ([[graft.operators.EvalText]]).
  * Gram strings join tokens with U+001F exactly like the expression-tree
  * forms (`concat_ws("", ...)`), so gram keys — and every count
  * aggregated from them — are byte-identical.
  *
  * Why native: the HOF formulation (per order, an index-aware `transform`
  * whose lambda runs `slice` + `concat_ws`) is excluded from whole-stage
  * codegen and costs interpreted-expression overhead PER GRAM (~2.5 s per
  * gram branch at the text_chrf eval panel, measured); this kernel emits
  * every gram of every order in one byte-copying loop over the row's
  * token bytes. Output order is (n asc, start asc) — a pure relabeling of
  * the rows fed to the downstream count aggregate, which is
  * order-insensitive.
  *
  * Null contract: a null token ARRAY nulls the result (standard
  * BinaryExpression); null ELEMENTS cannot occur (inputs are
  * `filter(split(...))` products — split never yields null elements).
  */
case class NgramsAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n", IntegerType, nullable = false),
      StructField("g", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes() = {
    val okL = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val okR = right.foldable && right.dataType == IntegerType
    if (okL && okR)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams_all needs (array<string>, foldable int), " +
          s"got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramsImpl.all(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NgramsImpl.all($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramsAll =
    copy(left = newLeft, right = newRight)
}

object NgramsImpl {
  private final val Sep: Byte = 0x1f

  /** The per-row kernel — one static method so the interpreted path and
    * generated code share the exact same bytes. */
  def all(tokens: ArrayData, maxN: Int): ArrayData = {
    val m = tokens.numElements()
    // token bytes fetched once (getUTF8String per gram would re-decode
    // the array header n times per gram)
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { tb(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    var total = 0
    var n = 1
    while (n <= maxN) { total += math.max(m - n + 1, 0); n += 1 }
    val out = new Array[Any](total)
    var o = 0
    n = 1
    while (n <= maxN) {
      var s = 0
      val last = m - n
      while (s <= last) {
        var len = n - 1
        var k = 0
        while (k < n) { len += tb(s + k).length; k += 1 }
        val buf = new Array[Byte](len)
        var p = 0
        k = 0
        while (k < n) {
          if (k > 0) { buf(p) = Sep; p += 1 }
          val t = tb(s + k)
          System.arraycopy(t, 0, buf, p, t.length)
          p += t.length
          k += 1
        }
        out(o) = InternalRow(n, UTF8String.fromBytes(buf))
        o += 1
        s += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

object NgramsNative {
  /** Column-level API: `ngramsAll($"tokens", maxN)`. */
  def ngramsAll(tokens: Column, maxN: Int): Column =
    GraftColumnBridge.column(
      NgramsAll(GraftColumnBridge.expression(tokens),
        GraftColumnBridge.expression(
          org.apache.spark.sql.functions.lit(maxN))))
}
