package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Layout.compactPlan]]: cumulative-size packing over the
  * deterministic (bytes DESC, source) order — bins are contiguous in
  * that order and each bin overfills its target by at most one file
  * (the floor(cum_before / target) bound). */
class CompactPlanSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("bin invariants on a skewed synthetic file population") {
    val d = java.nio.file.Files.createTempDirectory("compact").toString
    // 12 sources with heavily skewed sizes (one giant, many small)
    val docs = (0 until 12).flatMap { s =>
      val n = if (s == 0) 40 else 3 + s
      (0 until n).map(i => (s * 1000L + i, "x" * (10 + s), "en", s"s$s",
        (10 + s).toLong))
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")

    val plan = Layout.compactPlan(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    plan.length shouldBe 12

    val total = plan.map(_._2).sum
    val target = math.max(1L, total / Layout.CompactBins)

    // bins contiguous over the (bytes DESC, source) order
    val ordered = plan.sortBy { case (s, b, _) => (-b, s) }
    ordered.map(_._3) shouldBe ordered.map(_._3).sorted

    // every bin ≤ target + its largest file — the floor-cum bound.
    // (No lower bound: a file larger than the target legitimately
    // skips bin ids, so bins can stay below target under skew.)
    val byBin = plan.groupBy(_._3).toSeq.sortBy(_._1)
    byBin.foreach { case (_, fs) =>
      fs.map(_._2).sum should be <= (target + fs.map(_._2).max)
    }
    // packing efficiency: more than one file per bin on average
    byBin.size.toLong should be < plan.length.toLong
  }
}
