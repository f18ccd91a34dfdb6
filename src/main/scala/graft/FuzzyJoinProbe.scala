package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Dev probe for the edit-distance join at vocabulary scale:
  * synthesizes `n` distinct natural-entropy strings (random letters,
  * length 10–16) and plants one single-substitution near-dup per
  * `dupEvery` base strings, then times
  * [[FuzzyJoin.editDistancePairs]] and checks the planted pairs are
  * all recovered. Usage: `graft.FuzzyJoinProbe [n] [dupEvery]`. */
object FuzzyJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dupEvery = args.lift(1).map(_.toInt).getOrElse(10)
    // dupEvery=1 would make the plant predicate (i % dupEvery == 1)
    // vacuously false while nPlanted counted n−1 — spurious failure
    require(dupEvery >= 2, s"dupEvery must be >= 2, got $dupEvery")
    val spark = SparkSession.builder().master("local[32]")
      .appName("fuzzyjoin-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic generator; a planted near-dup appends nothing —
    // it substitutes position 3 with a letter outside the base draw
    // range, so it cannot collide with an independent base string
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(i.toLong * 2654435761L)
      val len = 10 + rnd.nextInt(7)
      val s = Array.fill(len)(('a' + rnd.nextInt(24)).toChar).mkString
      if (i % dupEvery == 1) s.updated(3, 'z').mkString else s
    }
    // the planted dup of base i-1 pairs with it at distance 1 only if
    // i%dupEvery==1 copies the PREVIOUS row's base; rebuild that way
    val vals = rows.zipWithIndex.map { case (s, i) =>
      if (i % dupEvery == 1 && i > 0) rows(i - 1).updated(3, 'z').mkString
      else s
    }.distinct
    val df = vals.toDF("s").repartition(64)
    val vocab = vals.size
    // every i%dupEvery==1 row is its predecessor's single-'z'
    // substitution ('z' is outside the base draw range a..x, so the
    // pair is always at exactly distance 1 and never a base string)
    val nPlanted = (1 until n by dupEvery).size

    val t0 = System.nanoTime()
    val pairs = FuzzyJoin.editDistancePairs(df, "s", maxDist = 2)
    val nPairs = pairs.count()
    val d1 = pairs.filter(col("dist") === 1).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"vocab=$vocab%,d pairs=$nPairs%,d dist1=$d1%,d " +
      f"planted=$nPlanted%,d join=$secs%.1f s")
    require(d1 >= nPlanted,
      s"recall failure: only $d1 distance-1 pairs found, " +
        s"$nPlanted were planted")
    spark.stop()
  }
}
