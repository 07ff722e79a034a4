package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: integer matrix–vector product
  * `out[j] = (float) (double) Σᵢ xs[i] · rot[j][i]` over a grid-integer
  * vector and a LITERAL rotation matrix — the per-row kernel of the
  * OPQ-lite lifecycle ([[graft.operators.Similarity]] `applyRotation`).
  *
  * Why native: the expression-tree formulation (an `array(...)` of dim
  * per-output sums, each a dim-term chain over dim extracted columns)
  * materializes dim² multiply-adds in ONE generated projection. At
  * dim = 64 that is ~4096 inlined operations plus a 64-argument
  * `doConsume` — past Janino's method/constant-pool limits, so EVERY plan
  * compilation failed (`InternalCompilerException`, ~6-8 s each) and then
  * ran interpreted; the OPQ bench entries spent minutes per rep in failed
  * compiles alone. This kernel is one static call site (the
  * [[LcsImpl]]/[[JaroWinklerImpl]] discipline), so the generated code
  * stays tiny and interpreted/codegen paths share arithmetic exactly.
  *
  * Arithmetic parity with the replaced tree: per output j the products
  * `xs[i] · rot[j][i]` are exact longs (|out| ≤ dim·10⁶·2·10⁶ ≈ 1.3·10¹⁴,
  * far under 2⁶³) summed left-to-right — long addition is associative and
  * overflow-free here, so the sum equals the old `reduce(_ + _)` chain
  * bit-for-bit; the close is the identical LONG→DOUBLE (exact below 2⁵³)
  * →FLOAT nearest-even narrowing the old `.cast("double").cast("float")`
  * performed. The DuckDB oracle replays the same chain
  * (`CAST(CAST(list_sum(...) AS DOUBLE) AS REAL)`), unchanged.
  *
  * Null contract: null ARRAY inputs null the result via the standard
  * BinaryExpression contract; elements are contract-non-null (grid
  * integers from a transform over non-null embedding components).
  */
case class RotateMatVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes() = {
    val okL = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okR = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (okL && okR)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rotate_matvec needs (array<bigint>, array<array<bigint>>), " +
          s"got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    MatVecImpl.rotate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MatVecImpl.rotate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RotateMatVec =
    copy(left = newLeft, right = newRight)
}

object MatVecImpl {
  /** The per-row kernel — one static method so the interpreted path and
    * generated code share the exact same arithmetic. */
  def rotate(xs: ArrayData, rot: ArrayData): ArrayData = {
    val dim = rot.numElements()
    val n = xs.numElements()
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val row = rot.getArray(j)
      val m = math.min(n, row.numElements())
      var acc = 0L
      var i = 0
      while (i < m) {
        acc += xs.getLong(i) * row.getLong(i)
        i += 1
      }
      out(j) = acc.toDouble.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}

object MatVecNative {
  /** Column-level API: `rotateMatVec($"xs", rotLiteral)`. */
  def rotateMatVec(xs: Column, rot: Column): Column =
    GraftColumnBridge.column(
      RotateMatVec(GraftColumnBridge.expression(xs),
        GraftColumnBridge.expression(rot)))
}
