package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{MaterializedAgg, TableLog}

/** Streaming append into the versioned table
  * ([[TableStreams.tableAppendStream]]): exactly-once under a REAL
  * crash replay — the checkpoint's commit marker for a batch is
  * deleted and the stream restarted, so foreachBatch re-runs the same
  * batch id against the table, and the txn stamp must turn the replay
  * into a no-op (no duplicate rows, no new version). */
class TableStreamSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("crash replay of a committed batch appends nothing twice") {
    val dir = Files.createTempDirectory("tablestream").toString
    val feed = Files.createTempDirectory("tablestream-feed").toString
    val ckpt = Files.createTempDirectory("tablestream-ckpt").toString
    TableLog.writeBase(spark,
      (0L until 100L).map(i => (i, s"base $i")).toDF("id", "body"), dir)

    def deliver(name: String, from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("tablestream-part").toString
      (from until until).map(i => (i, s"streamed $i")).toDF("id", "body")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(feed, name))
    }
    def runStream(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      // checkpointEvery=2: the second committed version triggers a
      // manifest checkpoint inside the sink
      val q = TableStreams.tableAppendStream(stream, dir, appId = "t",
        checkpointEvery = 2)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the manager's checkpoint-in-use registration clears
      // asynchronously after termination; a restart that races it
      // trips the concurrent-use guard
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty &&
          System.nanoTime() < deadline) Thread.sleep(50)
      spark.streams.resetTerminated()
    }

    deliver("b0.parquet", 1000, 1050)
    runStream()
    TableLog.currentVersion(spark, dir) shouldBe 1
    TableLog.readVersion(spark, dir).count() shouldBe 150

    // CRASH REPLAY: drop the checkpoint's commit marker for batch 0 —
    // on restart Structured Streaming re-runs batch 0 with the SAME
    // batch id through foreachBatch (the mid-batch-crash semantics).
    // Delete through the Hadoop FS so the checksum sibling (.0.crc)
    // goes too — a stale crc makes the re-commit collide
    val cfs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit0 = new org.apache.hadoop.fs.Path(s"$ckpt/commits/0")
    assert(cfs.exists(commit0), "checkpoint layout changed?")
    assert(cfs.delete(commit0, false))
    runStream()

    // the replayed batch must be a NO-OP: same version, same rows
    TableLog.currentVersion(spark, dir) shouldBe 1
    TableLog.readVersion(spark, dir).count() shouldBe 150
    TableLog.readVersion(spark, dir)
      .groupBy(col("id")).count().filter(col("count") > 1)
      .count() shouldBe 0

    // and a genuinely NEW batch still appends
    deliver("b1.parquet", 2000, 2020)
    runStream()
    TableLog.currentVersion(spark, dir) shouldBe 2
    TableLog.readVersion(spark, dir).count() shouldBe 170
    // v2 hit checkpointEvery=2 → the sink checkpointed: replay is one
    // log read, and the snapshot reads identically through it
    TableLog.replayCost(spark, dir) shouldBe 1
    TableLog.readVersion(spark, dir).count() shouldBe 170
  }

  test("append-with-view: crash replay leaves table AND view " +
      "byte-identical; a maintain-side crash catches up on replay") {
    val dir = Files.createTempDirectory("tsv").toString
    val view = Files.createTempDirectory("tsv-view").toString
    val feed = Files.createTempDirectory("tsv-feed").toString
    val ckpt = Files.createTempDirectory("tsv-ckpt").toString
    TableLog.writeBase(spark,
      (0L until 60L).map(i => (i, s"g${i % 3}", (i % 5).toLong))
        .toDF("id", "grp", "val"), dir)

    def deliver(name: String, from: Long, until: Long): Unit = {
      val tmp = Files.createTempDirectory("tsv-part").toString
      (from until until).map(i => (i, s"g${i % 4}", (i % 5).toLong))
        .toDF("id", "grp", "val")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(feed, name))
    }
    def runStream(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      val q = TableStreams.tableAppendWithViewStream(stream, dir,
        appId = "tv", viewDir = view, key = "id", dims = Seq("grp"),
        measures = Seq("val"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty &&
          System.nanoTime() < deadline) Thread.sleep(50)
      spark.streams.resetTerminated()
    }
    def viewMap() = MaterializedAgg.readView(spark, view)
      .select("grp", "n_rows", "sum_val").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def recomputed() = TableLog.readVersion(spark, dir)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("val").as("sum_val"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    deliver("b0.parquet", 1000, 1040)
    runStream()
    TableLog.currentVersion(spark, dir) shouldBe 1
    viewMap() shouldBe recomputed()
    val snapshot = viewMap()

    // CRASH REPLAY of the whole batch: both stamps must no-op
    val cfs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(cfs.delete(
      new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false))
    runStream()
    TableLog.currentVersion(spark, dir) shouldBe 1
    viewMap() shouldBe snapshot

    // crash BETWEEN append and maintain: simulate by appending the
    // next batch's rows directly (table moves ahead, view lags) —
    // the stream's next maintain must catch the view up
    TableLog.appendOnce(spark, dir,
      (2000L until 2025L).map(i => (i, s"g${i % 4}", (i % 5).toLong))
        .toDF("id", "grp", "val"), "other", 0L)
    deliver("b1.parquet", 3000, 3010)
    runStream()
    viewMap() shouldBe recomputed()
  }

  test("vacuum fences old versions loudly and keeps the latest intact") {
    val dir = Files.createTempDirectory("tablestream-vac").toString
    TableLog.writeBase(spark,
      (0L until 500L).map(i => (i, s"b$i")).toDF("id", "body")
        .repartition(4), dir)
    TableLog.upsert(spark, dir,
      Seq((1L, "u1"), (2L, "u2")).toDF("id", "body"), "id")
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    val latest = TableLog.readVersion(spark, dir).count()

    val deleted = TableLog.vacuum(spark, dir, retainVersions = 1)
    deleted should be > 0 // v0/v1-only files actually went away
    // the latest version reads exactly as before
    TableLog.readVersion(spark, dir).count() shouldBe latest
    // vacuumed versions fail at the API, not with a scan error
    val ex = intercept[IllegalArgumentException] {
      TableLog.readVersion(spark, dir, Some(0))
    }
    ex.getMessage should include("vacuumed")
    // idempotent: running vacuum again deletes nothing more
    TableLog.vacuum(spark, dir, retainVersions = 1) shouldBe 0
  }
}
