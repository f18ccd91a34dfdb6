package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.functions.expressions.{CosineSimilarity, DotProduct, L2DistanceSq}

/** Pins the round-4 verdict finding: [[DotProduct]] and
  * [[CosineSimilarity]] must declare `nullable = true` (they return
  * null on length mismatch / null element regardless of child
  * nullability). Without the override, codegen over NON-nullable
  * children treats `isNull` as the literal `false`, the generated
  * Java fails to compile ("isNull_0 is not an rvalue"), and the
  * projection silently drops to interpreted mode on the hottest
  * ANN-family kernels — and Catalyst may prune `isNotNull` filters
  * it believes are vacuous.
  */
class VectorCodegenSpec extends SparkSpec {

  private val arrTy = ArrayType(DoubleType, containsNull = false)
  private def ref(i: Int) = BoundReference(i, arrTy, nullable = false)

  test("codegen compiles over non-nullable array<double> children") {
    // GenerateUnsafeProjection.generate throws on a codegen compile
    // failure (no interpreted fallback at this layer) — this is the
    // direct no-fallback assertion.
    val proj = GenerateUnsafeProjection.generate(Seq(
      CosineSimilarity(ref(0), ref(1)),
      DotProduct(ref(0), ref(1)),
      L2DistanceSq(ref(0), ref(1))))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      ArrayData.toArrayData(Array(4.0, 5.0, 6.0)))
    val out = proj(row)
    assert(!out.isNullAt(0) && !out.isNullAt(1) && !out.isNullAt(2))
    assert(out.getDouble(1) == 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(out.getDouble(2) == 9.0 + 9.0 + 9.0)
    // length mismatch must produce null THROUGH the generated code
    val bad = InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayData.toArrayData(Array(1.0, 2.0, 3.0)))
    val out2 = proj(bad)
    assert(out2.isNullAt(0) && out2.isNullAt(1) && out2.isNullAt(2))
  }

  test("expressions are declared nullable regardless of children") {
    assert(CosineSimilarity(ref(0), ref(1)).nullable)
    assert(DotProduct(ref(0), ref(1)).nullable)
    assert(L2DistanceSq(ref(0), ref(1)).nullable)
  }

  test("l2_dist_sq is bit-identical to the HOF formulation") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1))).toDF("a", "b")
    val r = df.select(
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z).as("hof"),
      GraftFunctions.l2DistSq(col("a"), col("b")).as("native"))
      .collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("isNotNull filter over non-nullable children is not pruned") {
    val schema = StructType(Seq(
      StructField("a", arrTy, nullable = false),
      StructField("b", arrTy, nullable = false)))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Row(Seq(1.0), Seq(3.0, 4.0)))
    GraftFunctions.register(spark)
    // keep the LocalRelation from being eagerly evaluated so the
    // Filter node (or its absence, pre-fix) is observable
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val df = spark.createDataFrame(rows, schema)
      val filtered = df.filter(
        GraftFunctions.cosineSim(df("a"), df("b")).isNotNull)
      val optimized = filtered.queryExecution.optimizedPlan
      assert(optimized.collect { case f: Filter => f }.nonEmpty,
        s"isNotNull filter was pruned from:\n$optimized")
      // and the filter actually drops the mismatched-length row
      assert(filtered.count() == 1)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
