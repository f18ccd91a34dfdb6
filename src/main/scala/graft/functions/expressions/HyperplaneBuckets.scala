package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native multi-table sign-LSH bucket keys for an embedding: for
  * each of `tables` independent hyperplane families of `planes`
  * planes, bit_p = 1 iff v·plane ≥ 0; the table's key is the bucket
  * plus `table · 2^planes` so keys never collide across tables.
  *
  * The plane matrix (md5-derived, VectorFunctions.planeComponent) is
  * precomputed once per expression instance — the composable column
  * form expands to planes × tables × dim expression nodes (4096 for
  * 16×4×64), which is minutes of codegen/interpretation at corpus
  * scale; this walks the vector once per plane in a JVM loop.
  * Bit-identical to `hyperplaneBucket(v, planes, dim, t·planes)` on
  * WELL-FORMED input — dense, `dim`-length, null-free vectors (the
  * embedding contract; the parity spec pins exactly that domain).
  * Malformed input nulls: a vector shorter than `dim` or with a null
  * element returns null, so the row drops out of banding instead of
  * landing in a wrong-but-plausible bucket (the composable form also
  * nulls on the out-of-range element_at; SQL list ops would skip a
  * null product, which is the one remaining documented divergence).
  */
case class HyperplaneBuckets(child: Expression, planes: Int,
    tables: Int, dim: Int) extends UnaryExpression {

  // bucket-space sizing rule (NOTES.md): 2^planes must scale with the
  // corpus, so wide corpora need wide buckets — 30 planes (2^30
  // buckets) covers ~10^9 vectors; tables·2^planes stays < 2^36,
  // far inside the long key space
  require(planes > 0 && planes <= 30, "1..30 planes per table")
  require(tables > 0 && tables <= 64, "1..64 tables")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets requires array<double>, got $t")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  /** [table*planes + p][i] component matrix, built once. */
  private lazy val mat: Array[Array[Double]] =
    Array.tabulate(tables * planes)(p =>
      Array.tabulate(dim)(i =>
        graft.functions.VectorFunctions.planeComponent(p, i)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // a short vector would compute a partial dot and land in a
    // wrong-but-plausible bucket; null instead so the malformed
    // embedding drops out of banding (matches the composable form,
    // which nulls on the out-of-range element_at)
    if (arr.numElements() < dim) return null
    val n = dim
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      v(i) = arr.getDouble(i)
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val plane = mat(t * planes + p)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v(j) * plane(j); j += 1 }
        if (dot >= 0.0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket + t.toLong * (1L << planes)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBuckets", this)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $ref.nullSafeEval($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}
