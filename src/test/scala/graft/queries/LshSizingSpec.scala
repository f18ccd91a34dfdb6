package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sign-LSH sizing rule as arithmetic: bucket space exceeds
  * the corpus, tables grow with planes to hold the recall target,
  * and the shipped Wide configuration is what the rule derives for
  * the 2M-vector stress corpus.
  */
class LshSizingSpec extends AnyFunSuite {

  test("bucket space always exceeds the corpus") {
    for (n <- Seq(500L, 60_000L, 2_000_000L, 500_000_000L)) {
      val (planes, _) = Similarity.lshSizing(n)
      assert((1L << planes) >= n || planes == 30,
        s"n=$n planes=$planes")
    }
  }

  test("recall target is met by the derived table count") {
    for {
      n <- Seq(2_000_000L, 50_000_000L)
      minCos <- Seq(0.95, 0.98)
    } {
      val recall = 0.95
      val (planes, tables) = Similarity.lshSizing(n, minCos, recall)
      val p = 1.0 - math.acos(minCos) / math.Pi
      val achieved = 1.0 - math.pow(1.0 - math.pow(p, planes), tables)
      assert(achieved >= recall - 1e-9,
        s"n=$n cos=$minCos: $planes x $tables achieves $achieved")
    }
  }

  test("the shipped wide configuration follows the rule at 2M vectors") {
    val (planes, tables) = Similarity.lshSizing(2_000_000L, 0.98, 0.95)
    assert(planes == Similarity.WidePlanes, s"planes $planes")
    assert(tables <= Similarity.WideTables,
      s"rule wants $tables tables; shipped ${Similarity.WideTables} (extra recall)")
  }

  test("tiny corpora keep the floor configuration") {
    val (planes, _) = Similarity.lshSizing(500L)
    assert(planes == 16)
  }
}
