package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The IVF drift monitor against a MATERIALIZED index layout
  * ([[Similarity.driftCheckIndex]]): an in-distribution append batch
  * must NOT trip the rebuild trigger; a distribution-shifted one
  * must. This is the gate the real ingest path runs before
  * [[Similarity.appendToIvfIndex]] — appends assign against the
  * ORIGINAL centroids by design, so drift otherwise decays recall
  * with no error anywhere.
  */
class IndexDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("in-dist batch passes, drifted batch trips the rebuild trigger") {
    val idxPath = Files.createTempDirectory("graft-drift").toString + "/idx"
    Similarity.buildIvfIndex(spark, dir, idxPath)

    // in-distribution ingest: copies of indexed vectors above the
    // centroid-id range (the ivfAppendSizes convention) — statistically
    // exchangeable with the index population by construction
    val base = Tables.fanOut(spark.read
        .parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v")))
      .filter(col("vec_id") >= Similarity.NumCentroids &&
        col("vec_id") < Similarity.NumCentroids + 300)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("v"))

    val ok = Similarity.driftCheckIndex(spark, idxPath, base).collect()
    assert(ok.length == 1)
    val okRow = ok.head
    assert(okRow.getAs[Long]("rebuild") == 0L,
      s"in-dist batch tripped the trigger: $okRow")
    assert(okRow.getAs[Double]("kl") < Similarity.DriftKlThreshold / 2,
      s"in-dist KL should sit far below the threshold: $okRow")

    // drifted ingest: the same vectors warped into the positive
    // orthant — assignments concentrate, KL pops
    val drifted = base.select(col("vec_id"),
      transform(col("v"), x => abs(x)).as("v"))
    val bad = Similarity.driftCheckIndex(spark, idxPath, drifted).collect()
    assert(bad.length == 1)
    val badRow = bad.head
    assert(badRow.getAs[Long]("rebuild") == 1L,
      s"drifted batch did not trip the trigger: $badRow")
    assert(badRow.getAs[Double]("kl") > Similarity.DriftKlThreshold * 2,
      s"drifted KL should sit far above the threshold: $badRow")
  }
}
