package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions.cosine

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-identical to the higher-order formula") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val r = df.select(
      cosine(col("a"), col("b")).as("hof"),
      GraftFunctions.cosineSim(col("a"), col("b")).as("native"))
      .collect()
    r.foreach { row =>
      // exact equality: same index-order IEEE accumulation
      assert(row.getDouble(0) == row.getDouble(1))
    }
  }

  test("null / mismatch / zero-norm semantics") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
      (Seq(0.0, 0.0), Seq(1.0, 1.0))) // zero norm
      .toDF("a", "b")
    val r = df.select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) == 0.0)
    val n = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("works via SQL after extension registration") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT cosine_sim(array(1d,0d), array(1d,0d))")
      .collect().head.getDouble(0)
    assert(out == 1.0)
  }
}
