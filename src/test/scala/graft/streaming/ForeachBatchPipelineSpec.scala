package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.core.{ColumnPayload, Modality, ShardsConfig}
import graft.operators.{Pipeline, TextQualityFilter}

/** Collects per-batch results for assertion (executes on the driver —
  * foreachBatch runs its body driver-side). */
object BatchSink {
  val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  val sawQuality = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class ForeachBatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("batch pipeline stages run per micro-batch over a stream") {
    val dir = Files.createTempDirectory("graft-fbp").toString + "/in"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "the quick brown fox"),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), "HELLO!!! WORLD"),
      (3L, Timestamp.valueOf("2024-01-01 10:02:00"), "a normal sentence here"))
      .toDF("event_id", "ts", "text")
      .coalesce(1).write.parquet(dir)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)

    val config = ShardsConfig("/unused",
      Seq(ColumnPayload(Modality.Text, "text")))
    val stages = Seq(
      Pipeline.columnFilterStage(TextQualityFilter()),
      Pipeline.filterStage("nonempty", col("n_tokens") > 0))

    val q = EventStreams.foreachBatchPipeline(stream, config, stages) {
      (processor, _) =>
        BatchSink.counts.add(processor.count())
        if (processor.columns.contains("quality_score"))
          BatchSink.sawQuality.set(true)
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(BatchSink.counts.size() >= 1)
    var total = 0L
    BatchSink.counts.forEach(c => total += c)
    assert(total == 3)
    assert(BatchSink.sawQuality.get())
  }
}
