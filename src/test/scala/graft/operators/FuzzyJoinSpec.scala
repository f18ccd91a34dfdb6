package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (FuzzyJoin.editDistancePairs):
  * pruning losslessness vs the naive all-pairs join, both branch
  * boundaries, and distinct-first semantics. */
class FuzzyJoinSpec extends SparkSpec {

  private def naive(vals: Seq[String], k: Int): Set[(String, String, Long)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ds = vals.distinct
    (for {
      a <- ds; b <- ds if a < b
      dist = ed(a, b) if dist <= k
    } yield (a, b, dist.toLong)).toSet
  }

  private def run(vals: Seq[String], k: Int): Set[(String, String, Long)] = {
    import spark.implicits._
    FuzzyJoin.editDistancePairs(vals.toDF("s"), "s", maxDist = k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
  }

  test("matches the naive all-pairs join across both length branches") {
    // lengths straddle minMax = 9: pure-short pairs, pure-long pairs,
    // and mixed pairs where only the max crosses the boundary
    val vals = Seq(
      "a", "b", "ab", "ba", "abc",                    // l <= k: short branch
      "cat", "cut", "cart", "dog",                    // minimal segments
      "aaaa", "aaab", "abab", "baba",                 // repeats stress alignment
      "hippopotamus", "hippopotamux", "hixpopotamus",
      "abcdefgh", "abcdefghij",                       // indel pairs, Δl = 2
      "mississippi", "mississippe", "kississippi")
    for (k <- 1 to 3)
      assert(run(vals, k) == naive(vals, k), s"k=$k")
  }

  test("duplicated corpus values join once (distinct-first)") {
    val got = run(Seq("red bolt", "red bolt", "red bolt", "red boat"), 2)
    assert(got == Set(("red boat", "red bolt", 1L)))
  }

  test("pairs beyond the threshold are absent; nulls skipped") {
    import spark.implicits._
    val df = Seq(Some("abcdefghijkl"), Some("xbcdefxhijxl"), None)
      .toDF("s")
    // 3 substitutions > k=2 — must not appear even as a candidate
    assert(FuzzyJoin.editDistancePairs(df, "s", maxDist = 2)
      .collect().isEmpty)
  }

  test("testdata part names: pruned == naive (losslessness on real data)") {
    val parts = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_name")).collect().map(_.getString(0)).toSeq
    assert(run(parts, 2) == naive(parts, 2))
    assert(run(parts, 2).nonEmpty)
  }
}
