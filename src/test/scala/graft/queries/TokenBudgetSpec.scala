package graft.queries

import graft.SparkSpec

/** Invariants of the budget-constrained mixture selection beyond the
  * oracle hash-match: the budget is a hard cap per source, kept
  * counts are consistent with a greedy best-first fill, and the
  * result is bit-stable across runs.
  */
class TokenBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows: Map[String, (Double, Long, Long)] =
    Curation.tokenBudget(spark, dir).collect().map { r =>
      r.getAs[String]("source") ->
        ((r.getAs[Double]("threshold"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("chars_kept")))
    }.toMap

  test("budget is a hard cap and every source appears") {
    val m = rows
    assert(m.nonEmpty)
    m.foreach { case (src, (_, nKept, charsKept)) =>
      assert(charsKept <= Curation.SourceBudgetChars,
        s"$src exceeded budget: $charsKept")
      assert(nKept >= 0L)
    }
    spark.catalog.clearCache()
  }

  test("deterministic across runs") {
    val a = rows
    spark.catalog.clearCache()
    val b = rows
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("no doc outside the kept set could replace a kept doc (greedy order)") {
    // reconstruct: for each source the threshold is the score of the
    // worst admitted bucket — every doc STRICTLY above it must be
    // kept, i.e. sum of n_chars strictly above threshold <= budget
    import org.apache.spark.sql.functions._
    import graft.queries.Num._
    graft.functions.GraftFunctions.register(spark)
    val scored = Tables.fanOut(Tables.t(spark, dir, "documents"))
      .withColumn("f",
        graft.functions.GraftFunctions.textFeatures(col("text")))
      .select(col("source"), col("n_chars"),
        r4(graft.functions.TextFunctions
          .qualityScoreFromFeatures(col("f"))).as("score"))
    val m = rows
    val above = scored.collect().groupBy(_.getAs[String]("source")).map {
      case (src, rs) =>
        val thr = m(src)._1
        src -> rs.filter(_.getAs[Double]("score") > thr)
          .map(_.getAs[Long]("n_chars")).sum
    }
    above.foreach { case (src, chars) =>
      assert(chars <= Curation.SourceBudgetChars,
        s"$src: docs above threshold ($chars chars) overflow the budget — " +
          "threshold is not the greedy boundary")
    }
    spark.catalog.clearCache()
  }
}
