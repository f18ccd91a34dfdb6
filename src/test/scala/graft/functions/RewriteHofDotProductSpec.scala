package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._
import graft.functions.expressions.DotProduct

class RewriteHofDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hasNativeDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[DotProduct]))

  test("composable dot and squared-norm rewrite to the native expression") {
    GraftFunctions.register(spark)
    // non-literal input (literals would be constant-folded away
    // before the plan can be inspected)
    val df = spark.range(1, 3).select(
      transform(sequence(lit(1), lit(3)),
        i => (col("id") * i).cast("double")).as("a"),
      transform(sequence(lit(1), lit(3)),
        i => (col("id") + i).cast("double")).as("b"))
    val dotDf = df.select(dot(col("a"), col("b")).as("d"))
    assert(hasNativeDot(dotDf), dotDf.queryExecution.optimizedPlan.toString)
    // id=1: a=[1,2,3], b=[2,3,4] → 2+6+12 = 20
    // id=2: a=[2,4,6], b=[3,4,5] → 6+16+30 = 52
    assert(dotDf.collect().map(_.getDouble(0)).sorted.toSeq == Seq(20.0, 52.0))

    // norm uses aggregate(transform(x*x)) → DotProduct(a, a) inside sqrt
    val normDf = df.select(norm(col("a")).as("n"))
    assert(hasNativeDot(normDf), normDf.queryExecution.optimizedPlan.toString)
    assert(math.abs(normDf.collect().map(_.getDouble(0)).min -
      math.sqrt(14.0)) < 1e-12)
  }

  test("composable L2 pattern rewrites to the native L2DistanceSq") {
    GraftFunctions.register(spark)
    def hasNativeL2(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[
          graft.functions.expressions.L2DistanceSq]))
    val df = spark.range(1, 3).select(
      transform(sequence(lit(1), lit(3)),
        i => (col("id") * i).cast("double")).as("a"),
      transform(sequence(lit(1), lit(3)),
        i => (col("id") + i).cast("double")).as("b"))
    val l2 = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z).as("d"))
    assert(hasNativeL2(l2), l2.queryExecution.optimizedPlan.toString)
    // id=1: a=[1,2,3], b=[2,3,4] → 1+1+1 = 3
    // id=2: a=[2,4,6], b=[3,4,5] → 1+0+1 = 2
    assert(l2.collect().map(_.getDouble(0)).sorted.toSeq == Seq(2.0, 3.0))
    // flipped orientation (y−x)² is the same square and also rewrites
    val flipped = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => (y - x) * (y - x)),
      lit(0.0), (acc, z) => acc + z).as("d"))
    assert(hasNativeL2(flipped))
    assert(flipped.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(2.0, 3.0))
    // the MIXED form (x−y)(y−x) is the NEGATED square — must NOT match
    val mixed = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (y - x)),
      lit(0.0), (acc, z) => acc + z).as("d"))
    assert(!hasNativeL2(mixed))
    assert(mixed.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(-3.0, -2.0))
  }

  test("rewrite preserves null semantics of the HOF form") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // length mismatch
      (Some(Seq(1.0, 2.0)), None)) // null input
      .toDF("a", "b")
    val out = df.select(dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }

  test("float arrays are NOT rewritten (double-only pattern)") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    // dot() casts to double first, so this still rewrites; but a raw
    // float-typed aggregate must not match
    val raw = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0f), (acc, v) => acc + v).as("d"))
    assert(!hasNativeDot(raw))
    // value still correct through the untouched HOF path
    assert(math.abs(raw.collect().head.getFloat(0) - 11.0f) < 1e-6)
  }
}
