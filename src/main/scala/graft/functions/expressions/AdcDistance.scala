package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC lookup-table walk: `Σ_m lut[m][codes[m]]` — the
  * per-pair inner loop of PQ search ([[graft.queries.Similarity]]'s
  * `annPqAdc`/`annIvfPq`), fused into one primitive sweep.
  *
  * The composable form (`aggregate(zip_with(lut, codes, element_at))`)
  * runs as CodegenFallback — per-pair lambda dispatch and a zipped
  * intermediate array, at N·Q pairs the dominant ANN cost (NOTES.md).
  * Same fusion rationale as [[PqCodes]] and [[CosineSimilarity]].
  *
  * Bit-identical to the composable form on well-formed input: the
  * sum accumulates in ascending-m order over the SAME already-r6
  * LUT entries (the caller applies the outer r6 — this expression
  * returns the raw sum). Null semantics explicit: null arrays,
  * length mismatch, null elements, or an out-of-range code → null
  * (the composable form's null-propagation, made loud). */
case class AdcDistance(lut: Expression, codes: Expression)
    extends BinaryExpression {

  override def left: Expression = lut
  override def right: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (lut.dataType, codes.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_dist requires (array<array<double>>, array<int>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "adc_dist"

  override def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val l = lutAny.asInstanceOf[ArrayData]
    val c = codesAny.asInstanceOf[ArrayData]
    val m = l.numElements()
    if (m != c.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (l.isNullAt(i) || c.isNullAt(i)) return null
      val li = l.getArray(i)
      val code = c.getInt(i)
      if (code < 0 || code >= li.numElements() || li.isNullAt(code)) return null
      s += li.getDouble(code)
      i += 1
    }
    s
  }

  /** [[MinhashSignature]] pattern: codegen keeps the whole-stage
    * span, the body is the compiled eval via a bound reference. */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcDist", this)
    nullSafeCodeGen(ctx, ev, (l, c) => {
      val r = ctx.freshName("res")
      s"""Object $r = $ref.nullSafeEval($l, $c);
          if ($r == null) { ${ev.isNull} = true; }
          else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }"""
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(lut = newLeft, codes = newRight)
}
