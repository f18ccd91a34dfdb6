package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The checkpointed parquet sink round trip: stream files in,
  * write through parquetSink with AvailableNow, read the output back
  * — and a SECOND incremental run must process only the new input
  * (exactly-once via the checkpoint), not re-emit the old rows.
  */
class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed sink is exactly-once across restarts") {
    val in = Files.createTempDirectory("graft-sink-in").toFile
    val out = Files.createTempDirectory("graft-sink-out").toFile.getPath
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toFile.getPath

    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$in/batch0")
    val schema = spark.read.parquet(s"$in/batch0").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$in/*")
      val q = EventStreams.parquetSink(stream.withColumn("doubled",
          col("v") * 2), out, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 3)

    // restart with one more input file: only the delta lands
    Seq(4L, 5L).toDF("v").write.parquet(s"$in/batch1")
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 5, "re-run must not duplicate old rows")
    assert(rows.select(sum(col("doubled"))).head.getLong(0) == 30L)
  }
}
