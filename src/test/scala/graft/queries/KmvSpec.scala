package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV sketch semantics beyond the oracle hash-gate: the estimate
  * lands within the estimator's error band of the true distinct
  * count, the not-full sketch degrades to the exact answer, and the
  * result is independent of input partitioning (the per-partition
  * heap cap is lossless for the global k-minimum set).
  */
class KmvSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("estimate within the error band of the exact distinct count") {
    val row = Dedup.kmvDistinct(spark, dir).collect().head
    val exact = Tables.t(spark, dir, "documents")
      .select(md5(col("text").cast("binary"))).distinct().count()
    val est = row.getAs[Double]("est_distinct")
    assert(row.getAs[Long]("n_kept") == Dedup.KmvK)
    // std error ≈ 1/√(k−2) ≈ 8.9% at k=128; 3.5σ band
    val rel = math.abs(est - exact) / exact
    assert(rel < 0.35, f"relative error $rel%.3f (est $est%.1f vs $exact)")
  }

  test("sketch smaller than k is the exact distinct count; null text ignored") {
    val texts = (0 until 30).map(i => s"unique document number $i body")
    // 90 rows, 30 distinct texts — under k, so the sketch is exact;
    // the null-text row must be dropped, not crash the long encoder
    val docs = (0 until 90).map(i => (i.toLong, texts(i % 30))) :+
      (999L, null.asInstanceOf[String])
    val tmp = Files.createTempDirectory("graft-kmv-spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = Dedup.kmvDistinct(spark, tmp).collect().head
    assert(row.getAs[Long]("n_kept") == 30L)
    assert(row.getAs[Double]("est_distinct") == 30.0)
  }

  test("result independent of input partitioning") {
    // same corpus written as 1 file and as 7 files — the global
    // k-minimum distinct set (and so every output column) must match
    val src = Tables.t(spark, dir, "documents")
    val one = Files.createTempDirectory("graft-kmv-p1").toString
    val many = Files.createTempDirectory("graft-kmv-p7").toString
    src.coalesce(1).write.parquet(s"$one/documents.parquet")
    src.repartition(7).write.parquet(s"$many/documents.parquet")
    val a = Dedup.kmvDistinct(spark, one).collect().head
    val b = Dedup.kmvDistinct(spark, many).collect().head
    assert(a == b, s"partitioning changed the sketch: $a vs $b")
  }
}
