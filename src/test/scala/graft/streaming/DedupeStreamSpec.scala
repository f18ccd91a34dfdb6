package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec

class DedupeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops re-sent keys across micro-batches") {
    val dir = Files.createTempDirectory("graft-sdedup").toString + "/in"
    def ts(s: String) = Timestamp.valueOf(s)
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 2.0, "{}"))
    val batch2 = Seq(
      (1L, ts("2024-01-01 10:30:00"), 1L, "click", 1.0, "{}"), // dup id, later ts
      (3L, ts("2024-01-01 10:31:00"), 2L, "click", 3.0, "{}"))
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val flat = Files.createTempDirectory("graft-sdedup-flat").toString
    var n = 0
    def copy(d: java.io.File): Unit = d.listFiles().foreach { f =>
      if (f.isDirectory) copy(f)
      else if (f.getName.endsWith(".parquet")) {
        Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"p$n.parquet"))
        n += 1
      }
    }
    copy(new java.io.File(dir))

    val stream = EventStreams.readEventStream(spark, flat,
      maxFilesPerTrigger = 1)
    EventStreams.runAvailableNow(
      EventStreams.dedupeStream(stream, Seq("event_id")), "dedup_test")
    val ids = spark.table("dedup_test")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // duplicate id 1 dropped once
  }
}
