package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 semantics beyond the oracle hash-gate: term-frequency
  * monotonicity, the length normalization penalty, the idf rarity
  * reward, and partitioning independence of the ranking.
  */
class Bm25Spec extends SparkSpec {

  private def write(docs: Seq[String], tag: String): String = {
    val tmp = Files.createTempDirectory(s"graft-bm25-$tag").toString
    spark.createDataFrame(docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    }).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def ranking(dir: String): Seq[Long] =
    TextAnalysis.bm25TopK(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq

  test("more matching query terms rank higher at equal length") {
    // doc0 hits two query terms, doc1 one, doc2 none — equal lengths
    val dir = write(Seq(
      "query scan node node", "query node node node",
      "node node node node"), "tf")
    assert(ranking(dir).take(2) == Seq(0L, 1L))
    val scores = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(0L) > scores(1L) && scores(1L) > scores(2L))
    assert(scores(2L) == 0.0)
  }

  test("length normalization: same tf in a longer document scores lower") {
    val dir = write(Seq(
      "query node", "query node node node node node node node"), "len")
    val scores = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(0L) > scores(1L),
      s"short doc must outrank long at equal tf: $scores")
  }

  test("idf: a term present in fewer documents contributes more") {
    // 'filter' appears in 1 of 4 docs, 'query' in 3; the rare-term
    // doc must outrank a common-term doc of equal length
    val dir = write(Seq(
      "filter node", "query node", "query word", "query text"), "idf")
    val scores = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(0L) > scores(1L),
      s"rare-term doc must outrank common-term doc: $scores")
  }

  test("postings-join plan equals the column plan, including zero-score docs") {
    // only 1 doc matches any query term — the join path must still
    // surface the zero-score docs the candidate stream never saw
    val dir = write(Seq("query node", "word text", "node word"), "join")
    val a = TextAnalysis.bm25TopK(spark, dir).collect().map(_.toSeq)
    val b = TextAnalysis.bm25TopKJoin(spark, dir).collect().map(_.toSeq)
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
    assert(a.length == 3)
  }

  test("ranking independent of input partitioning") {
    val dir = "/root/testdata/sf0.001"
    val a = TextAnalysis.bm25TopK(spark, dir).collect().map(_.toSeq)
    val src = Tables.t(spark, dir, "documents")
    val many = Files.createTempDirectory("graft-bm25-p7").toString
    src.repartition(7).write.parquet(s"$many/documents.parquet")
    val b = TextAnalysis.bm25TopK(spark, many).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
