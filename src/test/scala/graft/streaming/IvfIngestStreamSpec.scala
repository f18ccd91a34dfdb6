package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.{Similarity, Tables}

/** Streaming IVF ingest ([[VectorStreams.ivfIngestStream]]): two
  * micro-batches of new vectors appended into a materialized index
  * must land EXACTLY like one batch append of their union (stream ==
  * batch), the second batch must assign against the index's original
  * centroids (cross-batch state is the index itself), and no row is
  * double-appended under a clean AvailableNow run.
  */
class IvfIngestStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val N = 24 // fresh vectors, 12 per micro-batch

  private def freshVecs(from: Int, until: Int) =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") >= from && col("vec_id") < until)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("v"))

  test("two streamed batches == one batch append; cross-batch " +
      "assignment against the original centroids") {
    val streamIdx = Files.createTempDirectory("graft_ivf_stream").toString
    val batchIdx = Files.createTempDirectory("graft_ivf_batchtwin").toString
    val feed = Files.createTempDirectory("graft_ivf_feed").toString
    val ckpt = Files.createTempDirectory("graft_ivf_ckpt").toString

    Similarity.buildIvfIndex(spark, dir, streamIdx)
    Similarity.buildIvfIndex(spark, dir, batchIdx)
    val baseRows = spark.read.parquet(streamIdx).count()

    // two single-file micro-batches (maxFilesPerTrigger=1)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_ivf_part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Paths.get(feed, name))
    }
    writeOne(freshVecs(0, N / 2), "b0.parquet")
    writeOne(freshVecs(N / 2, N), "b1.parquet")

    val schema = freshVecs(0, 1).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    val q = VectorStreams.ivfIngestStream(stream, streamIdx)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // batch twin: the union appended in one call
    Similarity.appendToIvfIndex(spark, batchIdx, freshVecs(0, N))

    def layout(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .select(col("vec_id"), col("cluster").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val s = layout(streamIdx)
    val b = layout(batchIdx)
    assert(s == b, s"stream layout != batch layout " +
      s"(stream ${s.size} rows, batch ${b.size})")
    // exactly base + N rows — nothing dropped, nothing double-appended
    assert(s.size == baseRows + N)
    // both micro-batches actually landed (ids from each half present)
    val ids = s.map(_._1).toSet
    assert(ids.contains(1000000L) && ids.contains(1000000L + N - 1))
    // copies of indexed vectors land in their twin's cluster: the
    // cross-batch proof that batch 2 assigned against the ORIGINAL
    // centroid rows, not state perturbed by batch 1
    val orig = spark.read.parquet(streamIdx)
      .filter(col("vec_id") < N)
      .select(col("vec_id"), col("cluster").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    s.filter(_._1 >= 1000000L).foreach { case (id, cl) =>
      assert(orig(id - 1000000L) == cl,
        s"vec $id landed in $cl, twin in ${orig(id - 1000000L)}")
    }
  }

  test("replay: the same micro-batch delivered twice leaves the " +
      "index files identical (exactly-once-effective)") {
    val idx = Files.createTempDirectory("graft_ivf_replay").toString
    val feed = Files.createTempDirectory("graft_ivf_replayfeed").toString
    val ckpt = Files.createTempDirectory("graft_ivf_replayckpt").toString
    Similarity.buildIvfIndex(spark, dir, idx)

    def deliver(name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_ivf_rpart").toString
      freshVecs(0, N / 2).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Paths.get(feed, name))
    }
    def runStream(): Unit = {
      val schema = freshVecs(0, 1).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      val q = VectorStreams.ivfIngestStream(stream, idx)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def indexFiles(): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length())).toSet
    }

    deliver("b0.parquet")
    runStream()
    val afterFirst = indexFiles()
    val rowsFirst = spark.read.parquet(idx).count()

    // the SAME batch content again, as a new source file — the
    // at-least-once double delivery the sink must absorb; it flows
    // through the real streaming aggregation, not a batch stand-in
    deliver("b0_replay.parquet")
    runStream()

    assert(indexFiles() == afterFirst,
      "replayed batch changed the index files")
    assert(spark.read.parquet(idx).count() == rowsFirst)
    // and the first delivery actually landed
    assert(spark.read.parquet(idx)
      .filter(col("vec_id") >= 1000000L).count() == N / 2)
  }

  test("a batch colliding with centroid ids fails the stream loudly") {
    val idx = Files.createTempDirectory("graft_ivf_guard").toString
    val feed = Files.createTempDirectory("graft_ivf_guardfeed").toString
    val ckpt = Files.createTempDirectory("graft_ivf_guardckpt").toString
    Similarity.buildIvfIndex(spark, dir, idx)
    // ids 0..11 sit INSIDE the centroid range [0, NumCentroids)
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 12)
      .coalesce(1).write.mode("overwrite").parquet(feed)
    val schema = freshVecs(0, 1).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    val q = VectorStreams.ivfIngestStream(stream, idx)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("centroid") ||
      Option(ex.getCause).exists(_.getMessage.contains("centroid")))
  }
}
