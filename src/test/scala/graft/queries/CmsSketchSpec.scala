package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch semantics beyond the oracle hash-gate: the
  * one-sided (overestimate-only) error guarantee, additive
  * mergeability of counter grids, bounded grid size, and partitioning
  * independence of the whole query.
  */
class CmsSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def terms = Tables.t(spark, dir, "documents")
    .select(explode(graft.functions.TextFunctions.tokens(
      lower(col("text")))).as("term"))

  test("estimates never undercount (one-sided error)") {
    val rows = TextAnalysis.cmsHeavy(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= exact, s"${r.getAs[String]("term")}: est $est < exact $exact")
    }
  }

  test("counter grids of corpus halves add to the whole-corpus grid") {
    val all = terms
    val a = all.filter(length(col("term")) % 2 === 0)
    val b = all.filter(length(col("term")) % 2 =!= 0)
    val whole = TextAnalysis.cmsCounters(all)
    val merged = TextAnalysis.cmsCounters(a)
      .unionByName(TextAnalysis.cmsCounters(b))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("grid never exceeds d x w cells") {
    val n = TextAnalysis.cmsCounters(terms).count()
    assert(n <= TextAnalysis.CmsD * TextAnalysis.CmsW,
      s"grid has $n cells")
  }

  test("result independent of input partitioning") {
    val a = TextAnalysis.cmsCounters(terms.coalesce(1)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val b = TextAnalysis.cmsCounters(terms.repartition(7)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }
}
