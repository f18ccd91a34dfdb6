package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming CDC keep-latest ([[EventStreams.compactStream]]) must
  * reproduce the batch compaction
  * ([[graft.queries.TimeSeries.eventsCompact]]) over the same
  * ingested data: each key's FINAL update row (largest n_versions)
  * equals the batch winner, including the event_id tiebreak and
  * version counts — with keys updated across micro-batch boundaries.
  */
class CompactStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("compactStream final rows == batch eventsCompact") {
    val dir = Files.createTempDirectory("graft-compact-stream").toString
    // two micro-batches; keys (1,click) and (2,view) receive UPDATES
    // in the second batch, (1,click) also exercises the event_id
    // tiebreak on an equal timestamp
    val b1 = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (11L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
      (12L, ts("2024-01-01 10:00:00"), 2L, "view", 3.0, "{}"),
      (13L, ts("2024-01-01 10:00:00"), 3L, "buy", 4.0, "{}"))
    val b2 = Seq(
      // same ts as event 11 but larger id → must win the tiebreak
      (14L, ts("2024-01-01 10:05:00"), 1L, "click", 5.0, "{}"),
      // strictly older than event 12 → must NOT displace it
      (9L, ts("2024-01-01 09:00:00"), 2L, "view", 6.0, "{}"),
      (15L, ts("2024-01-01 11:00:00"), 4L, "click", 7.0, "{}"))
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-cs-b$i").toString + "/o"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, s"events.parquet_part$i"))
    }
    // one directory holding both parts = the batch-side events table
    val batchDir = Files.createTempDirectory("graft-cs-batch").toString
    new java.io.File(batchDir, "events.parquet").mkdirs()
    new java.io.File(dir).listFiles().foreach { f =>
      Files.copy(f.toPath, java.nio.file.Paths.get(
        batchDir, "events.parquet", f.getName.replace("_part", "-")))
    }

    val stream = EventStreams.readEventStream(spark, dir,
      maxFilesPerTrigger = 1)
    val q = EventStreams.compactStream(stream).toDF()
      .writeStream.format("memory").queryName("compact_stream")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // final row per key = the one with that key's max n_versions
    // (monotone per key, so no ordering assumption on the sink)
    val updates = spark.table("compact_stream")
    assert(updates.count() > updates
      .select("user_id", "event_type").distinct().count(),
      "cross-batch keys must emit more than one update row")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("n_versions").desc)
    val streamFinal = updates
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        col("last_event_id"),
        expr("last_us div 1000000").as("last_sec"),
        round(col("last_value"), 2).as("last_value"),
        col("n_versions"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap

    val batchFinal = graft.queries.TimeSeries
      .eventsCompact(spark, batchDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap

    assert(streamFinal == batchFinal,
      s"stream $streamFinal\nbatch $batchFinal")
    // and the planted semantics explicitly:
    assert(streamFinal((1L, "click"))._1 == 14L,
      "equal-ts tiebreak must elect the larger event_id")
    assert(streamFinal((1L, "click"))._3 == 5.0 &&
      streamFinal((1L, "click"))._4 == 3L,
      "the tiebreak winner must carry its own value and the full " +
        "version count")
    assert(streamFinal((2L, "view"))._1 == 12L,
      "an older late event must not displace the newer version")
  }

  test("compactStreamWithTtl: an expired key re-ingests with " +
      "n_versions from 1; keys inside the horizon match batch") {
    val dir = Files.createTempDirectory("graft-compact-ttl").toString
    // four micro-batches (one file each, modification times forced
    // increasing so FileStreamSource replays them in order):
    //  b0: key (1,click) twice (n_versions reaches 2), key (2,view)
    //  b1: day+2 event → watermark jumps past key1/key2's ttl horizon
    //  b2: unrelated key — the batch in which the timeouts FIRE
    //      (timeouts only run for keys with no data in the batch)
    //  b3: key (1,click) re-ingested AFTER expiry → fresh history
    val batches = Seq(
      Seq((10L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (11L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
        (20L, ts("2024-01-01 10:00:00"), 2L, "view", 3.0, "{}")),
      Seq((30L, ts("2024-01-03 10:00:00"), 3L, "buy", 4.0, "{}")),
      Seq((40L, ts("2024-01-03 10:30:00"), 4L, "click", 5.0, "{}")),
      Seq((50L, ts("2024-01-03 11:00:00"), 1L, "click", 6.0, "{}")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-ttl-b$i").toString + "/o"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(dir, s"events.parquet_part$i")
      Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }

    val stream = EventStreams.readEventStream(spark, dir,
      maxFilesPerTrigger = 1)
    val q = EventStreams
      .compactStreamWithTtl(stream, ttl = "1 day", watermark = "1 hour")
      .toDF()
      .writeStream.format("memory").queryName("compact_ttl")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val updates = spark.table("compact_ttl")
    // rebirth breaks n_versions monotonicity BY DESIGN; the final row
    // per key is the one with the latest version (last_us, then
    // n_versions for late-arrival ties)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("last_us").desc, col("n_versions").desc)
    val fin = updates
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4), r.getLong(5)))).toMap

    // pre-expiry life accumulated versions…
    assert(updates.filter(col("user_id") === 1 && col("n_versions") === 2)
      .count() == 1, "key 1's first life must reach n_versions=2")
    // …and the post-expiry life starts over: state was really dropped
    assert(fin((1L, "click")) == ((50L, 6.0, 1L)),
      s"re-ingested key must count from 1, got ${fin((1L, "click"))}")

    // keys inside the retention horizon == batch compaction over the
    // retained events
    val batchDir = Files.createTempDirectory("graft-ttl-batch").toString
    new java.io.File(batchDir, "events.parquet").mkdirs()
    batches.drop(1).flatten
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$batchDir/events.parquet")
    val batchFin = graft.queries.TimeSeries.eventsCompact(spark, batchDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4), r.getLong(5)))).toMap
    Seq((1L, "click"), (3L, "buy"), (4L, "click")).foreach { k =>
      assert(fin(k) == batchFin(k), s"$k: ${fin(k)} != ${batchFin(k)}")
    }
  }
}
