package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.GroupTopK

/** Streaming per-group top-k — the deployment composition: an
  * UPDATE-mode stateful aggregation maintains per-(type, user)
  * running totals across micro-batches; the compacted latest rows
  * (max update count per key — the CompactStream election) feed
  * [[GroupTopK]] exactly as the batch query does. Stream == batch:
  * the final top-k per event type must equal
  * [[graft.queries.TimeSeries.eventsTopkUsers]] over the same
  * ingested data, ranks included — with per-user totals that only
  * become top-k AFTER the second micro-batch, so cross-batch state
  * accumulation is what the equality proves. */
class TopkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming running totals + GroupTopK == batch eventsTopkUsers") {
    val dir = Files.createTempDirectory("graft-topk-stream").toString
    // user 3 is NOT in batch-1's top-2 for "click" (1.0 < 5.0, 4.0)
    // but overtakes user 2 after batch 2 (1.0 + 9.0 = 10.0) — the
    // top-k must reflect accumulated state, not any single batch
    val b1 = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, "click", 5.0, "{}"),
      (11L, ts("2024-01-01 10:01:00"), 2L, "click", 4.0, "{}"),
      (12L, ts("2024-01-01 10:02:00"), 3L, "click", 1.0, "{}"),
      (13L, ts("2024-01-01 10:03:00"), 1L, "view", 2.0, "{}"))
    val b2 = Seq(
      (14L, ts("2024-01-01 11:00:00"), 3L, "click", 9.0, "{}"),
      (15L, ts("2024-01-01 11:01:00"), 4L, "click", 0.5, "{}"),
      (16L, ts("2024-01-01 11:02:00"), 2L, "view", 7.0, "{}"))
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-tk-b$i").toString + "/o"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(dir, s"events.parquet_part$i")
      java.nio.file.Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }

    val stream = EventStreams.readEventStream(spark, dir,
      maxFilesPerTrigger = 1)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("topk_stream")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // compact the update log to each key's LATEST row (n is monotone
    // per key — the CompactStream election), then rank exactly as
    // the batch query does
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "user_id").orderBy(col("n").desc)
    val perUser = spark.table("topk_stream")
      .withColumn("rk0", row_number().over(w)).filter(col("rk0") === 1)
      .select(col("event_type"), col("user_id"),
        // the SHARED rounding helper, so this spec cannot drift from
        // the batch side's epsilon policy
        graft.queries.Num.r2(col("sv")).as("user_value"), col("n"))
    val got = GroupTopK.topK(perUser, Seq("event_type"),
        Seq(("user_value", true), ("user_id", false)), k = 5)
      .select("event_type", "rk", "user_id", "user_value", "n")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet

    val batchDir = Files.createTempDirectory("graft-tk-batch").toString
    (b1 ++ b2)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$batchDir/events.parquet")
    val want = graft.queries.TimeSeries.eventsTopkUsers(spark, batchDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == want, s"stream $got\nbatch $want")
    // and the cross-batch overtake actually happened
    assert(got.exists(t => t._1 == "click" && t._2 == 1 && t._3 == 3L),
      s"user 3 must lead clicks after accumulation: $got")
  }
}
