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
