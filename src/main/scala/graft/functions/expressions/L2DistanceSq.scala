package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd squared L2 distance over two `array<double>`
  * columns — the exact-rerank kernel of the SQ8/brute-force search
  * paths (the cosine story of [[CosineSimilarity]] repeated: the
  * composable `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d,
  * _+_)` is a higher-order function Spark evaluates INTERPRETED —
  * per-element lambda dispatch in the hottest loop and a codegen
  * fence in every plan that uses it).
  *
  * Semantics are IDENTICAL to that formulation: left-to-right IEEE
  * accumulation of (a_i − b_i)²; null input, length mismatch, or
  * null element → null (so the parity spec can pin bit-equality).
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2_dist_sq requires two array<double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Returns null on length mismatch / null element even when both
  // children are non-nullable (the DotProduct/CosineSimilarity rule:
  // without this, codegen over non-nullable children emits
  // uncompilable Java and silently drops to interpreted mode).
  override def nullable: Boolean = true

  override def prettyName: String = "l2_dist_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          final double $d = $a.getDouble($i) - $b.getDouble($i);
          $acc += $d * $d;
        }
        if (!${ev.isNull}) ${ev.value} = $acc;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)
}
