package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the bounded-histogram exact quantile against the sorted-array
  * definition (smallest value whose cumulative count reaches
  * ceil(q·N)) on skewed data with heavy value ties — exactly the
  * distributions where approx sketches drift and naive sorts choke.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // zipf-ish: many ties at small values, a long sparse tail
  private val values = (0 until 5000).map { _ =>
    if (rnd.nextInt(10) < 7) rnd.nextInt(5).toLong
    else rnd.nextInt(1000).toLong
  }
  private val df = values.zipWithIndex
    .map { case (v, i) => (i.toLong, v, s"g${i % 3}") }
    .toDF("id", "v", "grp")

  test("exactQuantiles matches the sorted-array discrete quantile") {
    val qs = Seq((1, 10), (1, 4), (1, 2), (3, 4), (9, 10), (1, 1))
    val got = Quantiles.exactQuantiles(df, "v", qs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sorted = values.sorted
    qs.foreach { case (n, d) =>
      val rank = (sorted.length.toLong * n + d - 1) / d // ceil(q·N)
      val want = sorted((rank - 1).toInt)
      assert(got((n, d)) == want, s"q=$n/$d: got ${got((n, d))}, want $want")
    }
  }

  // reference ntile: stable sort by value, tile i covers ranks
  // ((i−1)·q + min(i−1, m) + 1) .. (i·q + min(i, m)), q = N div n,
  // m = N mod n — the definition ntile() implements
  private def refNtile(vs: Seq[Long], n: Int): Map[Int, (Long, Long, Long)] = {
    val sorted = vs.sorted
    val (q, m) = (sorted.length / n, sorted.length % n)
    (1 to n).flatMap { i =>
      val rlo = (i - 1) * q + math.min(i - 1, m) + 1
      val rhi = i * q + math.min(i, m)
      if (rhi < rlo) None
      else Some(i -> ((rhi - rlo + 1).toLong, sorted(rlo - 1), sorted(rhi - 1)))
    }.toMap
  }

  test("ntileBuckets reproduces exact ntile counts and value ranges per group") {
    val got = Quantiles.ntileBuckets(df, "v", 4, Seq("grp")).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byGrp = values.zipWithIndex.groupBy { case (_, i) => s"g${i % 3}" }
    byGrp.foreach { case (g, vi) =>
      val want = refNtile(vi.map(_._1), 4)
      want.foreach { case (tile, w) =>
        assert(got((g, tile)) == w, s"grp=$g tile=$tile: ${got((g, tile))} != $w")
      }
    }
    assert(got.size == byGrp.size * 4)
  }

  test("ntileBuckets global (no partition) and more tiles than rows") {
    val tiny = Seq(5L, 1L, 3L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Quantiles.ntileBuckets(tiny, "v", 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // ntile(10) over 3 rows: tiles 1..3 get one row each, 4..10 empty
    assert(got == Map(1 -> ((1L, 1L, 1L)), 2 -> ((1L, 3L, 3L)),
      3 -> ((1L, 5L, 5L))))
  }

  test("a histogram past maxBins fails LOUDLY — the bounded-domain " +
      "license is enforced, not assumed") {
    // 5000 distinct raw values (a 'continuous' column) with a tiny cap
    val continuous = (0 until 5000).map(i => (i.toLong, i * 1.000001))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Quantiles.exactQuantiles(continuous, "v", Seq((1, 2)), maxBins = 100)
        .collect()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
    assert(msg(e).contains("maxBins=100"), msg(e))
    assert(msg(e).contains("quantize"), msg(e))
    val e2 = intercept[Exception] {
      Quantiles.ntileBuckets(continuous, "v", 4, Nil, maxBins = 100)
        .collect()
    }
    assert(msg(e2).contains("maxBins=100"), msg(e2))
    // same shapes under the default cap still work (existing oracles
    // unchanged: bounded domains sail through)
    assert(Quantiles.exactQuantiles(df, "v", Seq((1, 2))).count() == 1)
  }

  test("keepAboveQuantile audit: kept mass >= 1 - q, groups partition N") {
    val audit = Quantiles.keepAboveQuantile(df, "v", "grp", 1, 10).collect()
    val total = audit.map(_.getLong(2)).sum
    val kept = audit.map(_.getLong(3)).sum
    assert(total == values.length)
    assert(kept >= (values.length * 9) / 10,
      s"kept $kept of $total below the 90% floor")
    val thresholds = audit.map(_.getLong(1)).distinct
    assert(thresholds.length == 1)
  }
}
