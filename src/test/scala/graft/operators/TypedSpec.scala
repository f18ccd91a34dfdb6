package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class TypedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("typed stats agree with the expression-based token count") {
    assume(new java.io.File(sf).isDirectory)
    val ds = Typed.docs(spark, sf)
    val typed = Typed.toStats(ds)
      .collect().map(s => s.doc_id -> s.nTokens).toMap
    val expr = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(typed == expr)
  }

  test("typed grouped reduction finds the longest doc per language") {
    assume(new java.io.File(sf).isDirectory)
    val ds = Typed.docs(spark, sf)
    val winners = Typed.longestPerLang(ds).collect()
      .map { case (lang, d) => lang -> d.n_chars }.toMap
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang")).agg(max(col("n_chars")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(winners == expected)
  }
}
