package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer squared-L2 distance of two
  * `array<bigint>` columns, `Σ (a_i - b_i)²`, as a bigint.
  *
  * This is the k-means hot loop: the `aggregate(zip_with(...))` formulation
  * evaluates interpreted (higher-order functions are excluded from
  * whole-stage codegen), paying lambda dispatch + boxing on every element of
  * every (row × centroid) pair. This expression generates a tight primitive
  * loop over `UnsafeArrayData.getLong` and participates in whole-stage
  * codegen. The arithmetic is IDENTICAL 64-bit integer math in the same
  * left-to-right order, so results are bit-exact with the HOF form and the
  * DuckDB `list_sum(list_transform(...))` oracle mirror — only evaluation
  * speed changes.
  */
case class VecSqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist needs two array<bigint> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDistLong =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  /** Column-level API: `vecSqDistLong($"xs", $"cs")`. */
  def vecSqDistLong(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecSqDistLong(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
