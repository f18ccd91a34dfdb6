package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Custom-state sessionization (`flatMapGroupsWithState`) over a
  * bounded four-micro-batch stream: a session emits exactly once —
  * when the watermark passes last + gap — with exact stats; an
  * out-of-order (but admissible) event merges BACKWARD into an open
  * session; still-open sessions never emit.
  */
class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def sec(s: String): Long = ts(s).getTime / 1000L

  /** batches written as part0..part3 in order (the file source picks
    * files by mtime-then-path; explicit ordered copy keeps batch
    * boundaries deterministic) */
  private lazy val eventsDir: String = {
    val flat = Files.createTempDirectory("graft-fmgws").toString
    val batches = Seq(
      Seq((1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:15:00"), 1L, "view", 2.0, "{}"),
        (3L, ts("2024-01-01 10:55:00"), 2L, "click", 3.0, "{}")),
      Seq((4L, ts("2024-01-01 11:05:00"), 1L, "click", 4.0, "{}"),
        (5L, ts("2024-01-01 12:30:00"), 1L, "click", 5.0, "{}"),
        (6L, ts("2024-01-01 12:40:00"), 2L, "view", 6.0, "{}")),
      // 12:15 arrives AFTER 12:30 was seen (admissible: watermark is
      // 12:10 here) and must extend that session backward
      Seq((7L, ts("2024-01-01 12:15:00"), 1L, "click", 7.0, "{}"),
        (8L, ts("2024-01-01 23:00:00"), 3L, "view", 8.0, "{}")),
      // watermark driver: pushes wm past every user-1/2 session close
      Seq((9L, ts("2024-01-01 23:30:00"), 3L, "view", 9.0, "{}")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-fmgws-b$i").toString + "/out"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath,
        java.nio.file.Paths.get(flat, s"part$i.parquet"))
    }
    flat
  }

  /** The strongest sessionization check: the custom-state operator
    * must reproduce the native session_window batch twin on the REAL
    * events table (same µs gap semantics: merge while next < last +
    * gap). A far-future driver event forces the watermark past every
    * real session so all of them emit. */
  test("statefulSessions == native session_window batch twin on real events") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val flat = Files.createTempDirectory("graft-fmgws-real").toString
    // batch 1: the real table converted to µs timestamps (the raw
    // parquet is TIMESTAMP(NANOS), unreadable through the streaming
    // TimestampType schema; the batch twin truncates to µs the same
    // way). batch 2: the watermark driver.
    val evDir = Files.createTempDirectory("graft-fmgws-ev").toString + "/o"
    graft.queries.Tables.t(spark, sfDir, "events")
      .select(col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(evDir)
    def copyPart(from: String, name: String): Unit = {
      val part = new java.io.File(from).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Paths.get(flat, name))
    }
    copyPart(evDir, "part0.parquet")
    val driverDir = Files.createTempDirectory("graft-fmgws-drv").toString + "/o"
    Seq((-1L, ts("2030-01-01 00:00:00"), -1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(driverDir)
    copyPart(driverDir, "part1.parquet")

    val stream = EventStreams.readEventStream(spark, flat,
      maxFilesPerTrigger = 1)
    EventStreams.runAvailableNow(
      EventStreams.statefulSessions(stream, gapMinutes = 30,
        watermark = "30 minutes").toDF(),
      "fmgws_real")
    val got = spark.table("fmgws_real")
      .filter(col("user_id") >= 0) // drop the driver event's user
      .select(col("user_id"), col("session_start"),
        (col("session_end") + graft.queries.TimeSeries.SessionGapSec)
          .as("session_end_gap"),
        col("n_events"),
        graft.queries.Num.r2(col("sum_value")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    val expected = graft.queries.TimeSeries
      .eventsSessionWindow(spark, sfDir)
      .select(col("user_id"), col("session_start"),
        col("session_end_gap"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(got.nonEmpty && got == expected,
      s"sizes: got=${got.size} expected=${expected.size}; " +
        s"onlyGot=${(got -- expected).take(3)} onlyExp=${(expected -- got).take(3)}")
  }

  test("sessions emit once the watermark passes last+gap; late events merge backward") {
    val stream = EventStreams.readEventStream(spark, eventsDir,
      maxFilesPerTrigger = 1)
    EventStreams.runAvailableNow(
      EventStreams.statefulSessions(stream, gapMinutes = 30,
        watermark = "30 minutes").toDF(),
      "fmgws_sessions")
    val got = spark.table("fmgws_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      // user 1: [10:05,10:15]; [11:05]; late 12:15 merges backward
      // into [12:30] → [12:15,12:30] n=2 sum=12.0
      (1L, sec("2024-01-01 10:05:00"), sec("2024-01-01 10:15:00"), 2L, 3.0),
      (1L, sec("2024-01-01 11:05:00"), sec("2024-01-01 11:05:00"), 1L, 4.0),
      (1L, sec("2024-01-01 12:15:00"), sec("2024-01-01 12:30:00"), 2L, 12.0),
      // user 2: both singleton sessions close by the final watermark
      (2L, sec("2024-01-01 10:55:00"), sec("2024-01-01 10:55:00"), 1L, 3.0),
      (2L, sec("2024-01-01 12:40:00"), sec("2024-01-01 12:40:00"), 1L, 6.0)))
    // user 3's sessions (23:00, 23:30) are never provably over → absent
    assert(!got.exists(_._1 == 3L))
  }
}
