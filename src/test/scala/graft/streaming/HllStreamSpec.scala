package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.{Tables, TimeSeries}

/** The streaming HLL registers folded over micro-batches must equal
  * the batch sketch over the same corpus bit-for-bit — registers
  * merge by elementwise max, and the estimate arithmetic is shared
  * (integer harmonic sum; round6 ≡ r6).
  */
class HllStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming estimate over 3 micro-batches == batch eventsHllUsers") {
    val src = Tables.t(spark, dir, "events")
      .select(col("event_type"), col("user_id"))
    val flat = Files.createTempDirectory("graft-hllstream").toString
    (0 until 3).foreach { i =>
      val part = Files.createTempDirectory(s"graft-hllpart$i").toString
      src.filter(pmod(col("user_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"b$i.parquet"))
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = SketchStreams.hllDistinctStream(stream,
        col("event_type"), col("user_id").cast("string")).toDF()
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("hll_stream").collect()
    // `batch` counts micro-batches in which THAT key received data —
    // latest state is each key's own max, not a global trigger index
    val finalRows = rows.groupBy(_.getAs[String]("key"))
      .map { case (k, rs) =>
        val r = rs.maxBy(_.getAs[Long]("batch"))
        k -> (r.getAs[Long]("n_present"), r.getAs[Long]("z_int"),
          r.getAs[Double]("est_distinct"))
      }
    val batch = TimeSeries.eventsHllUsers(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_present"), r.getAs[Long]("z_int"),
          r.getAs[Double]("est_users"))).toMap
    assert(finalRows == batch,
      s"stream $finalRows != batch $batch")
  }

  test("registers are bounded state: 256 bytes per key") {
    // white-box: the state class holds exactly M register bytes
    val s = SketchStreams.HllState(0L,
      new Array[Byte](graft.operators.HllSketch.M))
    assert(s.regs.length == 256)
  }
}
