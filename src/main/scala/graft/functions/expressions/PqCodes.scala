package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: one `array<double>` vector →
  * its per-subspace codeword ids against a FOLDABLE codebook literal
  * (the K full codeword vectors).
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the composable
  * argmin (`transform(segs, array_min(transform(..., struct(...))))`
  * in [[graft.queries.Similarity.pqCodes]]'s first formulation) runs
  * as CodegenFallback — per codeword it allocates a zipped array and
  * a struct, ~400 short-lived objects per row, which measured
  * GC-bound at 2M vectors (NOTES.md). This is the same fused-loop
  * promotion as [[MinhashSignature]]: one primitive-double sweep,
  * zero per-codeword allocation.
  *
  * Bit-identical to the composable form on well-formed vectors (the
  * parity spec pins it): per subspace m and codeword k the distance
  * is Σ_j (v[m·s+j] − cb[k][m·s+j])² accumulated left-to-right, then
  * r6-rounded exactly like `Num.r6` (add 1e-9, HALF_UP at 6
  * decimals — [[PqCodes.round6]] reproduces Spark's Round-on-double
  * BigDecimal path); the argmin keeps the LOWEST codeword id on
  * rounded-distance ties (the `array_min` struct order). Null
  * semantics are explicit where the composable form's were
  * null-propagation artifacts: null vector, null element, or a
  * length that is not the codebook's → null.
  */
case class PqCodes(vector: Expression, codebook: Expression, subDim: Int)
    extends BinaryExpression {

  require(subDim > 0, "pq_codes requires subDim > 0")

  override def left: Expression = vector
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (vector.dataType, codebook.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
        if codebook.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_codes codebook must be a literal (foldable)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_codes requires (array<double>, array<array<double>> literal), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Wrong-length vectors and null elements yield null regardless of
    * the children's nullability — without this override the planner
    * would prove the output non-null and codegen the impossible
    * branch away. */
  override def nullable: Boolean = true

  override def prettyName: String = "pq_codes"

  /** K × dim codeword matrix, extracted once from the literal. */
  private lazy val cb: Array[Array[Double]] = {
    val arr = codebook.eval(null).asInstanceOf[ArrayData]
    val out = Array.tabulate(arr.numElements()) { k =>
      arr.getArray(k).toDoubleArray()
    }
    require(out.nonEmpty, "pq_codes: codebook must not be empty")
    require(out.forall(_.length == out(0).length),
      "pq_codes: codebook vectors must share one dimension")
    require(out(0).length > 0 && out(0).length % subDim == 0,
      s"pq_codes: dimension ${out(0).length} not divisible by subDim $subDim")
    out
  }
  private lazy val dim: Int = cb(0).length
  private lazy val numSub: Int = dim / subDim

  override def nullSafeEval(v: Any, cbAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val vec = x.toDoubleArray()
    val codes = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val base = m * subDim
      var bestK = -1
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var s = 0.0
        var j = 0
        while (j < subDim) {
          val d = vec(base + j) - c(base + j)
          s += d * d
          j += 1
        }
        val dd = PqCodes.round6(s)
        if (dd < bestD) { bestD = dd; bestK = k }
        k += 1
      }
      codes(m) = bestK
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** Codegen keeps the surrounding whole-stage span; the body is the
    * compiled eval above via a bound reference ([[MinhashSignature]]
    * pattern — the work is the JVM loop, not tree dispatch). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this)
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val r = ctx.freshName("res")
      s"""Object $r = $ref.nullSafeEval($v, $c);
          if ($r == null) { ${ev.isNull} = true; }
          else { ${ev.value} =
            (org.apache.spark.sql.catalyst.util.ArrayData) $r; }"""
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(vector = newLeft, codebook = newRight)
}

object PqCodes {
  /** Exactly `Num.r6` = Spark `Round(x + 1e-9, 6)` on a double:
    * Spark's Round converts the double through its shortest decimal
    * representation (`BigDecimal.valueOf`, i.e. `Double.toString`)
    * and rounds HALF_UP at scale 6 — the spec pins this equality on
    * boundary values. NaN/±Infinity pass through unchanged, as
    * Spark's Round passes them (BigDecimal.valueOf would throw). */
  def round6(x: Double): Double = {
    val y = x + 1e-9
    if (java.lang.Double.isFinite(y))
      java.math.BigDecimal.valueOf(y)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    else y
  }
}
