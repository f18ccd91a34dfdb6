package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.{Dedup, Tables}

/** The streaming KMV sketch folded over micro-batches must equal the
  * batch sketch over the same corpus bit-for-bit — the KMV set is
  * mergeable, and the estimate arithmetic is shared (round6 ≡ r6).
  */
class KmvStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming estimate over 3 micro-batches == batch kmvDistinct") {
    import spark.implicits._
    val src = Tables.t(spark, dir, "documents")
    val flat = Files.createTempDirectory("graft-kmvstream").toString
    // three files → three micro-batches under maxFilesPerTrigger=1
    (0 until 3).foreach { i =>
      val part = Files.createTempDirectory(s"graft-kmvpart$i").toString
      src.filter(pmod(col("doc_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"b$i.parquet"))
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = SketchStreams.kmvDistinctStream(stream).toDF()
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("kmv_stream").collect()
    assert(rows.map(_.getAs[Long]("batch")).distinct.length == 3,
      "expected one estimate per micro-batch")
    val last = rows.maxBy(_.getAs[Long]("batch"))
    val batch = Dedup.kmvDistinct(spark, dir).collect().head
    assert(last.getAs[Long]("n_kept") == batch.getAs[Long]("n_kept"))
    assert(last.getAs[Long]("kth_hash") == batch.getAs[Long]("kth_hash"))
    assert(last.getAs[Double]("est_distinct") ==
      batch.getAs[Double]("est_distinct"))
  }

  test("under-full stream degrades to the exact running count") {
    import spark.implicits._
    val flat = Files.createTempDirectory("graft-kmvsmall").toString
    val docs = (0 until 10).map(i => (i.toLong, s"tiny doc $i"))
    val part = Files.createTempDirectory("graft-kmvsmall-p").toString
    spark.createDataFrame(docs).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(part)
    val f = new java.io.File(part).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(f.toPath, java.nio.file.Paths.get(flat, "b0.parquet"))
    val schema = spark.read.parquet(s"$flat/b0.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(flat)
    val q = SketchStreams.kmvDistinctStream(stream).toDF()
      .writeStream.format("memory").queryName("kmv_small")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val last = spark.table("kmv_small").collect()
      .maxBy(_.getAs[Long]("batch"))
    assert(last.getAs[Long]("n_kept") == 10L)
    assert(last.getAs[Double]("est_distinct") == 10.0)
  }
}
