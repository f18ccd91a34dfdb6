package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Semantics match the higher-order formulation
  * `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` exactly, including
  * the null cases that formulation produces: unequal lengths (zip
  * pads with null → null result), null element, or null input →
  * null; otherwise the left-to-right IEEE accumulation of products.
  * [[RewriteHofDotProduct]] rewrites that pattern to this expression
  * automatically.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Returns null on length mismatch / null element even when both
  // children are non-nullable, so this must be declared nullable:
  // otherwise codegen treats isNull as a constant (generated Java
  // fails to compile and the projection silently falls back to
  // interpreted mode) and Catalyst may prune isNotNull filters.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          $dot += $a.getDouble($i) * $b.getDouble($i);
        }
        if (!${ev.isNull}) ${ev.value} = $dot;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
