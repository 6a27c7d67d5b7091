package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two array<double> columns as a fully codegen'd
  * Catalyst Expression.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _*_), 0d,
  * _+_)`) runs interpreted — Spark never code-generates HOF lambdas —
  * and costs an expression-tree walk plus boxing per element. This
  * expression generates a tight primitive loop inside whole-stage
  * codegen instead; on 64-dim embedding pair joins that is the
  * difference between the cosine kernel dominating the stage and it
  * disappearing into the scan.
  *
  * Summation is left-to-right in element order, matching the HOF fold
  * it replaces, so oracle comparisons are bit-identical on equal-length
  * inputs. Length mismatch is a DELIBERATE behavior change: the old
  * zip_with/aggregate fold padded the shorter array with nulls and so
  * returned NULL for the whole product; this expression truncates to
  * the overlap and returns the partial sum. Mixed-dimension embedding
  * sets are caller error either way — truncation keeps the kernel
  * null-free and branch-free; callers needing strict checking should
  * validate dimensions upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    Shims.toColumn(DotProduct(
      Shims.toExpression(a.cast("array<double>")),
      Shims.toExpression(b.cast("array<double>"))))
}
