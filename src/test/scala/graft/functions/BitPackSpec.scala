package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.expressions.BitPack

/** [[BitPack]] — the binary-quantization encode: bit i set iff
  * v(i) > thresholds(i), packed into one long. Hand-computed values,
  * the null discipline (mismatch / null element / >64 dims → null),
  * the nullable-override codegen rule, and bit parity with the
  * composable `aggregate` formulation.
  */
class BitPackSpec extends SparkSpec {

  private val arrTy = ArrayType(DoubleType, containsNull = false)
  private def ref(i: Int) = BoundReference(i, arrTy, nullable = false)

  private def pack(v: Seq[Double], t: Seq[Double]): Any =
    BitPack(ref(0), ref(1)).nullSafeEval(
      ArrayData.toArrayData(v.toArray), ArrayData.toArrayData(t.toArray))

  test("hand-computed packings") {
    // v > t per position: (2>1)=1, (0>1)=0, (5>4)=1 → bits 0,2 → 5
    assert(pack(Seq(2.0, 0.0, 5.0), Seq(1.0, 1.0, 4.0)) == 5L)
    // equality is NOT above threshold: bit stays 0
    assert(pack(Seq(1.0, 1.0), Seq(1.0, 0.0)) == 1L << 1)
    // all below → 0; all above → 2^n − 1
    assert(pack(Seq(-1.0, -2.0), Seq(0.0, 0.0)) == 0L)
    assert(pack(Seq(1.0, 1.0, 1.0, 1.0), Seq.fill(4)(0.0)) == 15L)
    // bit 63 (the sign bit) must pack like any other
    val v64 = Seq.tabulate(64)(i => if (i == 63) 1.0 else -1.0)
    assert(pack(v64, Seq.fill(64)(0.0)) == Long.MinValue)
    // empty vector packs to 0 (no bits)
    assert(pack(Seq.empty, Seq.empty) == 0L)
  }

  test("null on mismatch and >64 dims") {
    assert(pack(Seq(1.0, 2.0), Seq(0.0)) == null)
    assert(pack(Seq.fill(65)(1.0), Seq.fill(65)(0.0)) == null)
    assert(pack(Seq.fill(64)(1.0), Seq.fill(64)(0.0)) == -1L)
  }

  test("nullable override + codegen compiles over non-nullable children") {
    assert(BitPack(ref(0), ref(1)).nullable)
    // GenerateUnsafeProjection throws on a codegen compile failure —
    // the no-silent-interpreted-fallback assertion (VectorCodegenSpec
    // rule)
    val proj = GenerateUnsafeProjection.generate(Seq(BitPack(ref(0), ref(1))))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(2.0, 0.0, 5.0)),
      ArrayData.toArrayData(Array(1.0, 1.0, 4.0))))
    assert(!out.isNullAt(0) && out.getLong(0) == 5L)
    val mismatch = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0)),
      ArrayData.toArrayData(Array(1.0, 2.0))))
    assert(mismatch.isNullAt(0))
  }

  test("bit-identical to the composable aggregate formulation") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val df = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1))).toDF("v", "t")
    val r = df.select(
      zip_with(col("v"), col("t"),
        (x, tt) => when(x > tt, lit(1L)).otherwise(lit(0L))).as("bits"),
      GraftFunctions.bitPack(col("v"), col("t")).as("native"))
      .collect()
    r.foreach { row =>
      val bits = row.getSeq[Long](0)
      val code = row.getLong(1)
      bits.zipWithIndex.foreach { case (b, i) =>
        assert(((code >>> i) & 1L) == b,
          s"bit $i: expected $b in code $code")
      }
    }
  }
}
