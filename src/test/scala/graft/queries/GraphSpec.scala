package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Triangle counting and co-occurrence PMI (queries/Graph). */
class GraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def writeEvents(dir: String, visits: Seq[(Long, Seq[Long])]): Unit =
    writeItemEvents(dir, visits)

  test("K4 yields 3 triangles per corner; a 4-cycle yields none") {
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    // user 7 walks all six K4 edges; user 8 walks a C4 (no triangles)
    writeEvents(dir, Seq(
      7L -> Seq(1L, 2L, 3L, 1L, 4L, 2L, 4L, 3L),
      8L -> Seq(10L, 11L, 12L, 13L, 10L)))
    val got = Graph.triangleCounts(spark, dir).collect()
      .map(r => (r.getAs[Long]("item"),
        (r.getAs[Long]("n_triangles"), r.getAs[Long]("degree")))).toMap
    assert(got == Map(1L -> (3L, 3L), 2L -> (3L, 3L),
      3L -> (3L, 3L), 4L -> (3L, 3L)))
  }

  test("triangles: driver fast path == distributed loop, bit-exact") {
    val fast = Graph.triangleCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = Graph.triangleCountsAt(spark, sf, fastPathMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == dist && fast.nonEmpty)
  }

  test("testdata PMI rows are internally consistent and thresholded") {
    val out = Graph.itemPmi(spark, sf).collect()
    assert(out.nonEmpty)
    // every row implies the same corpus total: wtot = e^pmi·wout·win/w —
    // recover it per row and require agreement to rounding error
    val wtots = out.map { r =>
      assert(r.getAs[Long]("w") >= Graph.PmiMinW)
      math.exp(r.getAs[Double]("pmi")) * r.getAs[Long]("wout") *
        r.getAs[Long]("win") / r.getAs[Long]("w")
    }
    val ref = wtots.head
    wtots.foreach(x => assert(math.abs(x - ref) / ref < 1e-4,
      s"inconsistent implied total: $x vs $ref"))
    assert(math.abs(ref - math.rint(ref)) / ref < 1e-4,
      s"implied total not an integer count: $ref")
  }
}
