package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Spectral.pcaPower]] on a fixture with a PLANTED dominant
  * direction: vectors = t·u + small noise for a known unit u, so the
  * top principal component must align with u and capture most of the
  * variance — a dead or misconverged iteration cannot pass. */
class SpectralSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    val dim = Spectral.Dim
    val rnd = new scala.util.Random(11)
    // planted unit direction: normalized alternating ramp
    val raw = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 + i / 64.0 else -0.5)
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    val u = raw.map(_ / nrm)
    val vecs = (0 until 400).map { k =>
      val t = rnd.nextGaussian() * 2.0
      (k.toLong,
        Array.tabulate(dim)(i => t * u(i) + rnd.nextGaussian() * 0.05).toSeq,
        0)
    }
    val dir = java.nio.file.Files.createTempDirectory("spectral").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = Spectral.pcaPower(spark, dir)
      .orderBy("i").collect()
    out.length shouldBe dim
    val v = out.map(_.getDouble(1))
    val ve = out.head.getDouble(3)
    // alignment |<v, u>| ≈ 1 (sign is start-vector-determined)
    val align = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    align should be > 0.999
    // planted direction carries variance 4.0 vs noise 0.05² per dim
    ve should be > 0.9
    // gram audit: diagonal covariance along the planted direction
    val gram = Spectral.embedGram(spark, dir)
      .where("i = j").collect()
    gram.length shouldBe dim
    // every diagonal entry is a variance: non-negative
    gram.foreach(r => r.getDouble(3) should be >= -1e-6)
  }
}
