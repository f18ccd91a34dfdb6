package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus assembly (Curation.curationPipeline) — the
  * non-triviality guards the hash gate can't provide: a 0-row result
  * hash-matches a 0-row oracle, so emptiness regressions (e.g. a
  * quality rule the corpus can't satisfy) must fail HERE. */
class CurationPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the pipeline keeps a non-trivial, strictly-shrunk corpus") {
    val out = Curation.curationPipeline(spark, sf)
      // coalesce: sum over an empty result is null, and the whole
      // point of this spec is to diagnose the empty-result case
      .agg(coalesce(sum(col("n_docs")).cast("long"), lit(0L)),
        count(lit(1)))
      .collect().head
    val (kept, sources) = (out.getLong(0), out.getLong(1))
    val total = spark.read
      .parquet(s"$sf/documents.parquet").count()
    assert(kept > 0, "pipeline must keep something — an empty result " +
      "passes the hash gate trivially (the blind-gate lesson)")
    // every stage bites: eval exclusion alone removes ~5%
    assert(kept < total * 95 / 100, s"kept $kept of $total — no stage bit")
    assert(sources > 0)
  }

  test("each stage only ever shrinks the survivor set") {
    def perSource(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    val pipeline = perSource(Curation.curationPipeline(spark, sf))
    // upper bound: the gopher gate alone (same four content rules)
    val gateOnly = perSource(
      Curation.gopherDocFlags(spark, sf)
        .filter(!col("fw") && !col("fl") && !col("fs") && !col("fa"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    pipeline.foreach { case (src, n) =>
      assert(n <= gateOnly.getOrElse(src, 0L),
        s"$src: pipeline kept $n > gate-only ${gateOnly.get(src)}")
    }
  }
}
