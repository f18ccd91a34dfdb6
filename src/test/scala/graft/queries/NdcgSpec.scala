package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Similarity.annNdcg]]: nDCG is 1 exactly when the IVF list equals
  * the exact list in order, and strictly below 1 otherwise (distinct
  * graded gains + strictly decreasing discounts make any deviation —
  * wrong member or wrong order — lose DCG). */
class NdcgSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("ndcg = 1 iff the approx list matches the exact list in order") {
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian()), i % 8)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val ndcg = Similarity.annNdcg(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val k = Similarity.IvfTopK
    val approx = Similarity.annIvf(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(2)).map(_.getLong(3)).toSeq
      }
    val exact = Similarity.annBruteForce(spark, dir).collect()
      .filter(_.getLong(1) <= k)
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      }

    ndcg.keySet shouldBe exact.keySet
    var mismatches = 0
    ndcg.foreach { case (q, v) =>
      v should be <= 1.0
      v should be > 0.0
      if (approx(q) == exact(q)) {
        withClue(s"query $q lists agree but ndcg=$v: ") {
          v shouldBe 1.0
        }
      } else {
        mismatches += 1
        withClue(s"query $q lists differ but ndcg=$v: ") {
          v should be < 1.0
        }
      }
    }
    // fixture sanity: random gaussians + probe-1 IVF must produce at
    // least one imperfect list, or the iff test is vacuous
    mismatches should be > 0
  }
}
