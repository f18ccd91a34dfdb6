package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** two micro-batch files of events across 3 hours and 2 users */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:15:00"), 1L, "view", 2.0, "{}"),
      (3L, ts("2024-01-01 10:55:00"), 2L, "click", 3.0, "{}"))
    val batch2 = Seq(
      (4L, ts("2024-01-01 11:05:00"), 1L, "click", 4.0, "{}"),
      // >30min gap for user 1 → second session
      (5L, ts("2024-01-01 12:30:00"), 1L, "click", 5.0, "{}"),
      (6L, ts("2024-01-01 12:40:00"), 2L, "view", 6.0, "{}"))
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/batch$i")
    }
    // flatten: the file source reads a flat dir of parquet files
    val flat = Files.createTempDirectory("graft-stream-flat").toString
    val fs = new java.io.File(dir)
    var n = 0
    // sorted walk: listFiles order is filesystem-dependent, and the
    // file source's batch order follows mtime-then-path — an unsorted
    // copy could feed batch1 after batch0's watermark passed it
    def copyAll(d: java.io.File): Unit =
      d.listFiles().sortBy(_.getName).foreach { f =>
        if (f.isDirectory) copyAll(f)
        else if (f.getName.endsWith(".parquet")) {
          Files.copy(f.toPath,
            java.nio.file.Paths.get(flat, s"part$n.parquet"))
          n += 1
        }
      }
    copyAll(fs)
    flat
  }

  test("hourly windowed aggregation over a bounded stream") {
    val stream = EventStreams.readEventStream(spark, eventsDir,
      maxFilesPerTrigger = 1)
    EventStreams.runAvailableNow(
      EventStreams.hourlyAggregates(stream), "hourly_test",
      outputMode = "complete")
    val got = spark.table("hourly_test")
      .select(date_format(col("bucket_start"), "HH").as("hh"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("10", "click", 2L, 4.0),
      ("10", "view", 1L, 2.0),
      ("11", "click", 1L, 4.0),
      ("12", "click", 1L, 5.0),
      ("12", "view", 1L, 6.0)))
  }

  test("session windows close on the 30-minute gap") {
    val stream = EventStreams.readEventStream(spark, eventsDir)
    EventStreams.runAvailableNow(
      EventStreams.sessionAggregates(stream), "sessions_test",
      outputMode = "complete")
    val got = spark.table("sessions_test")
      .select(col("user_id"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // user 1: events at 10:05,10:15 + 11:05 — 10:15→11:05 is 50min > gap
    //   → sessions (2 events, 3.0) and (1 event, 4.0), then 12:30 → (1, 5.0)
    // user 2: 10:55 and 12:40 → two singleton sessions
    assert(got == Set(
      (1L, 2L, 3.0), (1L, 1L, 4.0), (1L, 1L, 5.0),
      (2L, 1L, 3.0), (2L, 1L, 6.0)))
  }

  test("streaming hourly matches the equivalent batch aggregation") {
    val batch = spark.read.parquet(eventsDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val stream = spark.table("hourly_test")
    assert(batch.exceptAll(stream).isEmpty && stream.exceptAll(batch).isEmpty)
  }
}
