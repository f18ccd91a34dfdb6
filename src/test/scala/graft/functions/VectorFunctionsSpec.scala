package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native hyperplane_buckets matches the composable per-table buckets") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val dim = 16
    val vecs = Seq.fill(40)(Seq.fill(dim)(rnd.nextGaussian()))
    val df = vecs.toDF("v")
      .withColumn("native",
        GraftFunctions.hyperplaneBuckets(col("v"), 8, 3, dim))
      .withColumn("composed", array((0 until 3).map { t =>
        hyperplaneBucket(col("v"), 8, dim, t * 8).cast("long") +
          lit(t.toLong * 256L)
      }: _*))
    df.select(col("native"), col("composed")).collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  private val df = Seq(
    (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
    (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))).toDF("a", "b")

  test("dot / norm / cosine basics") {
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      cosine(col("a"), col("b")).as("c"),
      norm(col("a")).as("n")).collect()
    assert(r(0).getDouble(0) == 0.0)
    assert(r(0).getDouble(1) == 0.0)
    assert(math.abs(r(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(2) - math.sqrt(14.0)) < 1e-12)
    // zero vector → cosine defined as 0
    assert(r(2).getDouble(1) == 0.0)
  }

  test("l2 distance and normalize") {
    val r = df.select(
      l2(col("a"), col("b")).as("d"),
      norm(l2Normalize(col("a"))).as("n")).collect()
    assert(math.abs(r(0).getDouble(0) - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(r(0).getDouble(1) - 1.0) < 1e-12)
    assert(r(2).getDouble(1) == 0.0) // zero vector stays zero
  }

  test("planeComponent is deterministic and in [-0.5, 0.5)") {
    val c1 = planeComponent(3, 17)
    val c2 = planeComponent(3, 17)
    assert(c1 == c2)
    assert(c1 >= -0.5 && c1 < 0.5)
    assert(planeComponent(0, 0) != planeComponent(1, 0))
  }

  test("hyperplaneBucket lands in [0, 2^planes) and is deterministic") {
    val vecs = Seq(Seq.fill(8)(0.5f), Seq.tabulate(8)(i => i.toFloat))
      .toDF("v")
    val b = vecs.select(hyperplaneBucket(col("v"), 4, 8).as("b"))
      .collect().map(_.getInt(0))
    b.foreach(x => assert(x >= 0 && x < 16))
    val b2 = vecs.select(hyperplaneBucket(col("v"), 4, 8).as("b"))
      .collect().map(_.getInt(0))
    assert(b.sameElements(b2))
  }
}
