package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.{Tables, TextAnalysis}

/** The streaming count-min grid folded over micro-batches must equal
  * the batch grid over the same corpus exactly — counters are
  * additive, and the arithmetic is integer-only so there is no
  * rounding to absorb anything.
  */
class CmsStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming grid over 3 micro-batches == batch cmsCounters") {
    val terms = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(
          lower(col("text")))).as("term"))
    val flat = Files.createTempDirectory("graft-cmsstream").toString
    (0 until 3).foreach { i =>
      val part = Files.createTempDirectory(s"graft-cmspart$i").toString
      terms.filter(pmod(col("doc_id"), lit(3)) === i)
        .select(col("term")).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"b$i.parquet"))
    }
    val schema = spark.read.parquet(s"$flat/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = SketchStreams.cmsCountersStream(stream).toDF()
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // latest value per cell: each cell's own max data-batch
    val rows = spark.table("cms_stream").collect()
    val finalCells = rows.groupBy(r => (r.getAs[Int]("r"),
        r.getAs[Long]("bucket")))
      .map { case (k, rs) =>
        k -> rs.maxBy(_.getAs[Long]("batch")).getAs[Long]("cnt")
      }
    val batch = TextAnalysis.cmsCounters(
        terms.select(col("term"))).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(finalCells == batch,
      s"stream ${finalCells.size} cells vs batch ${batch.size}")
  }
}
