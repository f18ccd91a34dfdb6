package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>`
  * columns — the hot inner loop of every ANN/near-dup operator.
  *
  * Why a custom Catalyst expression (SURVEY.md §7.3 tier b): the
  * composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * in [[graft.functions.VectorFunctions]]) is built from higher-order
  * functions, which Spark evaluates INTERPRETED — per-element lambda
  * dispatch and boxed accumulators inside the hottest loop, and a
  * codegen fence in every plan that uses it. This expression is one
  * fused primitive double loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the composable version (same index
  * order, same IEEE sequence: dot and both norms accumulate left to
  * right; zero-norm → 0.0), so swapping it in cannot change oracle
  * results:
  *   - null input array, length mismatch, or null element → null
  *     (the higher-order pipeline also nulls in those cases);
  *   - else dot(a,b) / (sqrt(Σa²) · sqrt(Σb²)), 0.0 on zero norms.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType is private[sql] in Spark 4, so explicit check
  // instead of ExpectsInputTypes; callers cast to array<double>
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Returns null on length mismatch / null element even when both
  // children are non-nullable, so this must be declared nullable:
  // otherwise codegen treats isNull as a constant (generated Java
  // fails to compile and the projection silently falls back to
  // interpreted mode) and Catalyst may prune isNotNull filters.
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          final double $x = $a.getDouble($i);
          final double $y = $b.getDouble($i);
          $dot += $x * $y;
          $na += $x * $x;
          $nb += $y * $y;
        }
        if (!${ev.isNull}) {
          final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
        }
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
