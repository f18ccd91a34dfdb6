package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-aware survivor election (Dedup.dedupBestSurvivor): the
  * survivor must be the argmax-quality member of its own cluster
  * (doc_id tie-break), and clusters must match the components query. */
class BestSurvivorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("survivor is the argmax-quality member of each cluster") {
    val out = Dedup.dedupBestSurvivor(spark, sf).collect()
    assert(out.nonEmpty)
    val comp = Dedup.dedupComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("component") -> r.getAs[Long]("n_docs")).toMap
    val quality = TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    // rebuild membership from the survivors query's own cluster ids:
    // every member's quality must be <= the survivor's, with the
    // tie broken toward the smaller id
    val labels = graft.operators.ConnectedComponents
      .connectedComponents(
        Dedup.dedupMinhash(spark, sf)
          .select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
    val members = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    out.foreach { r =>
      val c = r.getAs[Long]("component")
      val sid = r.getAs[Long]("survivor_id")
      val sq = r.getAs[Double]("survivor_quality")
      assert(r.getAs[Long]("n_docs") == comp(c), s"cluster size mismatch: $r")
      val best = members(c).map(id => (quality(id), id))
        .sortBy { case (q, id) => (-q, id) }.head
      assert((sq, sid) == best, s"wrong survivor for cluster $c: $r vs $best")
    }
  }
}
