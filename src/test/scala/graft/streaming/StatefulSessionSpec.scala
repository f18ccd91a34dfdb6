package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

/** Custom-state sessionization (`flatMapGroupsWithState`) over a
  * bounded two-micro-batch stream: sessions closed by an observed gap
  * must emit with exact stats; still-open sessions must NOT emit
  * (append mode emits a session only once it is provably over).
  */
class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def sec(s: String): Long = ts(s).getTime / 1000L

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-fmgws").toString
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:15:00"), 1L, "view", 2.0, "{}"),
      (3L, ts("2024-01-01 10:55:00"), 2L, "click", 3.0, "{}"))
    val batch2 = Seq(
      (4L, ts("2024-01-01 11:05:00"), 1L, "click", 4.0, "{}"),
      (5L, ts("2024-01-01 12:30:00"), 1L, "click", 5.0, "{}"),
      (6L, ts("2024-01-01 12:40:00"), 2L, "view", 6.0, "{}"))
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val flat = Files.createTempDirectory("graft-fmgws-flat").toString
    var n = 0
    def copyAll(d: java.io.File): Unit =
      d.listFiles().foreach { f =>
        if (f.isDirectory) copyAll(f)
        else if (f.getName.endsWith(".parquet")) {
          Files.copy(f.toPath,
            java.nio.file.Paths.get(flat, s"part$n.parquet"))
          n += 1
        }
      }
    copyAll(new java.io.File(dir))
    flat
  }

  test("gap-closed sessions emit exactly once with exact stats") {
    val stream = EventStreams.readEventStream(spark, eventsDir,
      maxFilesPerTrigger = 1)
    EventStreams.runAvailableNow(
      EventStreams.statefulSessions(stream, gapMinutes = 30).toDF(),
      "fmgws_sessions")
    val got = spark.table("fmgws_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    // user 1: [10:05,10:15] closes at 11:05 (50min gap); [11:05]
    // closes at 12:30 (85min gap); [12:30,...] still open — not
    // emitted. user 2: [10:55] closes at 12:40; [12:40,...] open.
    assert(got == Set(
      (1L, sec("2024-01-01 10:05:00"), sec("2024-01-01 10:15:00"), 2L, 3.0),
      (1L, sec("2024-01-01 11:05:00"), sec("2024-01-01 11:05:00"), 1L, 4.0),
      (2L, sec("2024-01-01 10:55:00"), sec("2024-01-01 10:55:00"), 1L, 3.0)))
  }
}
