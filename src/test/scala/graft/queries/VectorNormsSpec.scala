package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Spectral.vectorNorms]] on fixtures where the fence must actually
  * fire: the production corpus is L2-normalized (every norm quantizes
  * to the same milli bin, MAD = 0, zero outliers — the true verdict),
  * so the oracle alone never exercises the outlier census. Here we
  * plant broken rows (zeroed buffer, overflow-scale vector) in an
  * un-normalized population and pin the census. */
class VectorNormsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def run(vecs: Seq[Seq[Option[Double]]])
      : (Long, Long, Long, Long, Long, Long) = {
    val d = java.nio.file.Files.createTempDirectory("vnorms").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val r = Spectral.vectorNorms(spark, d).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  private def whole(vecs: Seq[Seq[Double]]) = vecs.map(_.map(Option(_)))

  test("planted broken rows land outside the MAD fence") {
    val rnd = new scala.util.Random(3)
    // healthy population: norms UNIFORM in 2.0 ± 0.1 — a bounded
    // spread, so the 3·MAD fence (≈ ±0.15) covers every healthy row
    // and flags exactly the planted breakage (a gaussian population
    // would legitimately flag its own ~4.5% tail at 3·MAD)
    val healthy = Seq.fill(200) {
      val raw = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      val target = 2.0 + (rnd.nextDouble() - 0.5) * 0.2
      raw.map(_ / n * target).toSeq
    }
    // broken rows: a zeroed buffer, two overflow-scale vectors, and a
    // null-ELEMENT row (truncated write) that must surface as n_bad,
    // not silently join the stats
    val broken = whole(Seq(
      Seq.fill(16)(0.0),
      Seq.fill(16)(10.0),
      Seq.fill(16)(25.0))) :+
      (Seq[Option[Double]](Some(1.0), None) ++ Seq.fill(14)(Some(0.0)))
    val (n, med, mad, nLow, nHigh, nBad) = run(whole(healthy) ++ broken)
    n shouldBe 203L // the null-element row is censused, not counted
    med shouldBe 2000L +- 100L
    mad should be > 0L
    mad should be < 200L
    nLow shouldBe 1L // the zero vector
    nHigh shouldBe 2L // both overflow rows
    nBad shouldBe 1L // the null-element row
  }

  test("constant-norm corpus: MAD 0, zero outliers — the degenerate verdict") {
    val vecs = whole(Seq.fill(50)(Seq.fill(4)(0.5))) // norm = 1.0 exactly
    val (n, med, mad, nLow, nHigh, nBad) = run(vecs)
    n shouldBe 50L
    med shouldBe 1000L
    mad shouldBe 0L
    nLow shouldBe 0L
    nHigh shouldBe 0L
    nBad shouldBe 0L
  }
}
