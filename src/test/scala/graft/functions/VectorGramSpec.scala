package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[graft.functions.expressions.VectorGram]]: hand-computed values,
  * equivalence with the declarative explode/groupBy formulation, the
  * loud ragged-input contract, and the map-side-combine plan shape. */
class VectorGramSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def gram(rows: Seq[Seq[Double]], dim: Int) = {
    GraftFunctions.register(spark)
    rows.toDF("v")
      .select(GraftFunctions.vectorGram(col("v")
        .cast("array<double>"), dim).as("g"))
      .select("g.n", "g.sums", "g.prods")
      .head()
  }

  test("hand-computed 2-dim gram over three vectors") {
    // vectors (1,2), (3,4), (5,6):
    // n=3, sums=(9,12), m2 = [[1+9+25, 2+12+30], [., 4+16+36]]
    val r = gram(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0)), 2)
    r.getLong(0) shouldBe 3L
    r.getSeq[Double](1) shouldBe Seq(9.0, 12.0)
    r.getSeq[Double](2) shouldBe Seq(35.0, 44.0, 44.0, 56.0)
  }

  test("matches the per-pair sum-of-products on random data") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(50)(Seq.fill(5)(rnd.nextDouble() - 0.5))
    val r = gram(data, 5)
    val prods = r.getSeq[Double](2)
    for (i <- 0 until 5; j <- 0 until 5) {
      val expected = data.map(v => v(i) * v(j)).sum
      prods(i * 5 + j) shouldBe expected +- 1e-9
    }
    for (i <- 0 until 5)
      r.getSeq[Double](1)(i) shouldBe data.map(_(i)).sum +- 1e-9
    r.getLong(0) shouldBe 50L
  }

  test("ragged vector fails the job loudly") {
    val ex = intercept[Exception] {
      gram(Seq(Seq(1.0, 2.0), Seq(3.0)), 2)
    }
    ex.getMessage should include("ragged")
  }

  test("null vectors are skipped, null elements are loud") {
    GraftFunctions.register(spark)
    val withNullRow = Seq(Some(Seq(1.0, 2.0)), None).toDF("v")
      .select(GraftFunctions.vectorGram(col("v")
        .cast("array<double>"), 2).as("g"))
      .select("g.n").head()
    withNullRow.getLong(0) shouldBe 1L
  }

  test("plan aggregates map-side (partial vector_gram below exchange)") {
    GraftFunctions.register(spark)
    val df = Seq.fill(8)(Seq(1.0, 2.0)).toDF("v")
      .repartition(4)
      .select(GraftFunctions.vectorGram(col("v")
        .cast("array<double>"), 2).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    // partial + final aggregate pair: the buffer, not the rows,
    // crosses the exchange
    plan should include("vector_gram")
    plan.split("vector_gram").length should be >= 3
  }
}
