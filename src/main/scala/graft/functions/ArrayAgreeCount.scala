package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Number of positions where two array<long> columns hold the same
  * value — the MinHash signature-agreement kernel (est. Jaccard =
  * agree / numHashes).
  *
  * The HOF form (`aggregate(zip_with(a, b, ...))`) runs interpreted:
  * an expression-tree walk plus boxing per element, per candidate
  * pair. This expression generates a primitive loop inside whole-stage
  * codegen instead, so the agreement count disappears into the
  * candidate join's stage the way DotProduct does for cosine.
  *
  * Comparison is positional over the common prefix (mismatched lengths
  * are caller error — signatures share numHashes by construction);
  * null elements never agree (a planted null can't inflate a Jaccard
  * estimate).
  */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_agree_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) {
         |    $agree++;
         |  }
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeCount =
    copy(left = newLeft, right = newRight)
}

object ArrayAgreeCount {
  def arrayAgreeCount(a: Column, b: Column): Column =
    Shims.toColumn(ArrayAgreeCount(
      Shims.toExpression(a.cast("array<bigint>")),
      Shims.toExpression(b.cast("array<bigint>"))))
}
