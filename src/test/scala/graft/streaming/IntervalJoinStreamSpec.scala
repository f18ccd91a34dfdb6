package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Watermarked stream-stream interval join
  * (EventStreams.intervalJoinStream): click→purchase attribution
  * pairs, stream == batch on the same corpus, window edges inclusive
  * on both ends. */
class IntervalJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    Seq(
      // user 1: click at 10:00; purchases at 10:05 (in), 10:10
      // (boundary, in), 10:11 (out)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "purchase", 10.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 20.0, "{}"),
      (4L, ts("2024-01-01 10:11:00"), 1L, "purchase", 30.0, "{}"),
      // user 2: purchase BEFORE any click → no pair
      (5L, ts("2024-01-01 10:01:00"), 2L, "purchase", 40.0, "{}"),
      (6L, ts("2024-01-01 10:02:00"), 2L, "click", 2.0, "{}"),
      // user 2: two clicks both within 10 min of the 10:09 purchase
      // → BOTH pair (interval joins enumerate, they don't elect)
      (7L, ts("2024-01-01 10:04:00"), 2L, "click", 3.0, "{}"),
      (8L, ts("2024-01-01 10:09:00"), 2L, "purchase", 50.0, "{}"),
      // a later hour so the watermark passes the earlier windows
      (9L, ts("2024-01-01 12:00:00"), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/files")
    s"$dir/files"
  }

  private val expected = Set(
    (1L, 1L, 2L), (1L, 1L, 3L), // click 1 → purchases 10:05, 10:10
    (2L, 6L, 8L), (2L, 7L, 8L)) // both user-2 clicks → purchase 10:09

  test("stream-stream interval join == the batch join, edges inclusive") {
    val stream = EventStreams.readEventStream(spark, eventsDir)
    val joined = EventStreams.intervalJoinStream(
      stream, stream, "click", "purchase")
    EventStreams.runAvailableNow(joined, "ssjoin")
    val got = spark.table("ssjoin")
      .select(col("user_id"), col("left_id"), col("right_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)

    val static = spark.read.schema(EventStreams.EventSchema)
      .parquet(eventsDir)
    val batch = EventStreams.intervalJoinStream(
      static, static, "click", "purchase")
      .select(col("user_id"), col("left_id"), col("right_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got, "batch twin must emit the identical pair set")
  }
}
