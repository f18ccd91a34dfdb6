package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd 1-bit vector quantizer: packs an `array<double>`
  * vector against a per-dimension threshold array into ONE long —
  * bit i (0-based, from the array's 0-based index) is set iff
  * `v[i] > thresholds[i]`.
  *
  * This is the encode half of binary-quantization ANN (the 1-bit
  * member of the PQ/SQ8 quantization family): at 64 dims the packed
  * code is 8 bytes versus 512 bytes of doubles — a 64× scan-bandwidth
  * cut — and the coarse distance becomes
  * `bit_count(code XOR qcode)`, two codegen'd integer instructions
  * per PAIR instead of a 64-iteration float loop. Dimension count
  * is capped at 64 (one machine word by design: a wider embedding
  * should pack into `array<long>` words — not this expression's
  * contract).
  *
  * Null vector or thresholds → null; length mismatch, dims > 64, or
  * a null element → null (the [[L2DistanceSq]] discipline — callers
  * filter null codes so a malformed vector is dropped, never elected
  * with a garbage code).
  */
case class BitPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bit_pack requires two array<double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // Returns null on length mismatch / null element even when both
  // children are non-nullable (the DotProduct/CosineSimilarity rule:
  // without this, codegen over non-nullable children emits
  // uncompilable Java and silently drops to interpreted mode).
  override def nullable: Boolean = true

  override def prettyName: String = "bit_pack"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != t.numElements() || n > 64) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || t.isNullAt(i)) return null
      if (x.getDouble(i) > t.getDouble(i)) acc |= (1L << i)
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
      s"""
      final int $n = $a.numElements();
      if ($n != $b.numElements() || $n > 64) {
        ${ev.isNull} = true;
      } else {
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          if ($a.getDouble($i) > $b.getDouble($i)) $acc |= (1L << $i);
        }
        if (!${ev.isNull}) ${ev.value} = $acc;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitPack =
    copy(left = newLeft, right = newRight)
}
