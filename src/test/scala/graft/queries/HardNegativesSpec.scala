package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining (Similarity.hardNegatives): every mined
  * negative must be cross-label, ranked densely, and drawn from the
  * query's own IVF cluster (the probe-1 contract). */
class HardNegativesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("negatives are cross-label, densely ranked, from the probed cluster") {
    val out = Similarity.hardNegatives(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("qlabel") != r.getAs[Long]("neg_label"), r)
      val sim = r.getAs[Double]("sim")
      assert(sim >= -1.0 - 1e-6 && sim <= 1.0 + 1e-6, r)
    }
    // dense ranks 1..k per query
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val rks = rows.map(_.getAs[Long]("rk")).sorted
      assert(rks.toSeq == (1L to rks.length).toSeq)
      assert(rks.length <= Similarity.IvfTopK)
    }
    // probe-1: neighbor cluster == query cluster
    val assign = Similarity.ivfAssign(spark, sf)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(assign(r.getAs[Long]("query_id")) ==
        assign(r.getAs[Long]("neighbor_id")), s"cross-cluster negative: $r")
    }
  }
}
