package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted integer PageRank (Graph.pagerankItems): hand-traced exact
  * state on a two-node chain, plus mass bounds on testdata. */
class PagerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two-node chain matches the hand-traced integer state") {
    val dir = java.nio.file.Files.createTempDirectory("pr").toString
    // one user visits item 1 then item 2: single edge 1→2, w=1
    writeItemEvents(dir, Seq(7L -> Seq(1L, 2L)))
    // N=2, S=1e9: r0 = 5e8 each; base = 15e9/200 = 75e6.
    // i1: c(2) = (5e8·17)//20 = 425e6  → r = (75e6, 500e6)
    // i2: c(2) = (75e6·17)//20 = 63.75e6 → r = (75e6, 138.75e6)
    // i3: same inflow (src rank unchanged) → fixed point reached
    val got = Graph.pagerankItems(spark, dir)
      .select("item", "rank_int").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 75000000L, 2L -> 138750000L))
  }

  test("driver fast path == distributed loop, bit-exact") {
    val fast = Graph.pagerankItems(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.pagerankItemsAt(spark, sf, fastPathMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
  }

  test("fast-path gate bounds NODES too: sparse edges over a wide " +
      "vocabulary takes the distributed loop, identically") {
    val dir = java.nio.file.Files.createTempDirectory("prgate").toString
    // 1 edge but 7 nodes: five isolated single-visit items + a chain.
    // gate=2 admits the edge list yet must REJECT the fast path (the
    // driver loop would collect the unbounded node set).
    writeItemEvents(dir, Seq(
      7L -> Seq(1L, 2L),
      1L -> Seq(10L), 2L -> Seq(11L), 3L -> Seq(12L),
      4L -> Seq(13L), 5L -> Seq(14L)))
    val gated = Graph.pagerankItemsAt(spark, dir, fastPathMaxEdges = 2L)
      .select("item", "rank_int").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = Graph.pagerankItemsAt(spark, dir, Long.MaxValue)
      .select("item", "rank_int").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated.size == 7 && gated == driver)
  }

  test("testdata: mass bounded, every node ranked, sink decay visible") {
    val out = Graph.pagerankItems(spark, sf)
      .agg(sum("rank_int").cast("long").as("mass"),
        count(lit(1)).as("n"), min("rank_int").as("lo"))
      .collect().head
    val (mass, n, lo) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(n > 0)
    // total mass can only shrink from S (truncation + dangling decay)
    assert(mass <= Graph.PrScale)
    // every node keeps at least the damping base share
    assert(lo >= 15L * Graph.PrScale / (100L * n))
  }
}
