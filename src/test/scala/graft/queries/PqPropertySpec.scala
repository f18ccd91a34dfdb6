package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generative parity sweep for the native PQ encoder: on seeded
  * random corpora (mixed magnitudes, negatives, exact duplicates of
  * codebook seeds) the fused expression must agree with the
  * composable HOF formulation on every (vector, subspace) cell — the
  * spot where an off-by-one in segment indexing, a rounding drift, or
  * a tie-break inversion would surface first.
  */
class PqPropertySpec extends SparkSpec {

  private def corpus(seed: Long, n: Int, scale: Double): String = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val v = (0 until Similarity.Dim)
        .map(_ => ((rng.nextDouble() - 0.5) * scale).toFloat)
      (i.toLong, v, 0)
    }
    val tmp = Files.createTempDirectory(s"graft-pqprop$seed").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("native == HOF on seeded random corpora across magnitudes") {
    for ((seed, scale) <- Seq((1L, 1.0), (2L, 1e-6), (3L, 1e6))) {
      val tmp = corpus(seed, 80, scale)
      val native = Similarity.pqEncode(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val hof = Similarity.pqEncodeHof(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(native.size == 80 * Similarity.PqM)
      assert(native == hof, s"divergence at seed=$seed scale=$scale: " +
        (native.toSet diff hof.toSet).take(5).toString)
    }
  }
}
