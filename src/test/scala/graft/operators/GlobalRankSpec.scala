package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[GlobalRank]]: rank values identical to the single-reducer
  * `row_number() OVER (ORDER BY …)` window on a multi-partition
  * fixture, with no Window in the plan. */
class GlobalRankSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("matches row_number over a total order, across partitions") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(100)))
      .toDF("id", "v").repartition(7)
    val ranked = GlobalRank.rank(df, Seq(col("v"), col("id")), "ord")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // expected via in-memory sort on the same total order
    val data = df.collect().map(r => (r.getLong(0), r.getInt(1)))
    val order = data.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    ranked shouldBe order
  }

  test("curriculum order interleaves buckets round-robin") {
    val d = java.nio.file.Files.createTempDirectory("curr").toString
    // 3 effective buckets with uneven sizes via n_chars
    val docs = (0L until 90L).map { i =>
      val nch = if (i % 9 < 4) 10L else if (i % 9 < 7) 110L else 210L
      (i, "t", "en", "s", nch)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = graft.queries.Curation.curriculumOrder(spark, d)
    out.queryExecution.executedPlan.toString should not include "Window"
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length shouldBe 90
    // ord is a permutation of 1..n
    rows.map(_._4).sorted shouldBe (1L to 90L)
    // ord order == (rn, bucket) lex order
    val byOrd = rows.sortBy(_._4)
    byOrd.map(t => (t._3, t._2)) shouldBe
      byOrd.map(t => (t._3, t._2)).sortBy(identity)
    // while every bucket still has rows, consecutive rounds cycle all
    // three buckets: the first 3·minCount positions alternate buckets
    val minCnt = rows.groupBy(_._2).map(_._2.length).min
    val head = byOrd.take(3 * minCnt).map(_._2)
    head.grouped(3).foreach(g => g.toSet.size shouldBe 3)
  }
}
