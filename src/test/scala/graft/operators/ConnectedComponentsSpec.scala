package graft.operators

import graft.SparkSpec

/** Hash-min connected components: chains (multi-round propagation),
  * cliques, disjoint components, duplicate/self edges, and the
  * cluster-size summary used by corpus dedup.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to its minimum — needs diameter rounds") {
    val m = comps(Seq(5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint cliques keep separate minima; bridge merges them") {
    val cliqueA = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val cliqueB = Seq(10L -> 11L, 11L -> 12L, 10L -> 12L)
    val m = comps(cliqueA ++ cliqueB)
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L)
    assert(m(10L) == 10L && m(11L) == 10L && m(12L) == 10L)
    val bridged = comps(cliqueA ++ cliqueB :+ (3L -> 10L))
    assert(bridged.values.toSet == Set(1L))
  }

  test("self-loops and duplicate edges are harmless") {
    val m = comps(Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 1L -> 2L))
    assert(m == Map(1L -> 1L, 2L -> 1L))
  }

  test("componentSizes summarizes one row per cluster") {
    val sizes = ConnectedComponents.componentSizes(
      Seq(5L -> 4L, 4L -> 3L, 10L -> 11L).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(3L -> 3L, 10L -> 2L))
  }
}
