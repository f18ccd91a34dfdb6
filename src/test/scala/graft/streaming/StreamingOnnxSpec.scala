package graft.streaming

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.SparkSpec
import graft.core.{FilePayload, FilesConfig, Modality}
import graft.onnx.{OnnxModel, TestOnnx}
import graft.operators.{OnnxScoreFilter, Pipeline}

/** Streaming twin of the ONNX enrichment path: an [[OnnxScoreFilter]]
  * with a REAL serialized model runs inside foreachBatch, and the
  * per-executor session cache must survive micro-batches — one cold
  * model load across the whole stream, stream scores == batch scores.
  */
object StreamingOnnxSink {
  val scores =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  val batches = new java.util.concurrent.atomic.AtomicInteger(0)
}

class StreamingOnnxSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int): Array[Byte] = {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 77777) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-stream-onnx").toFile
    (0 until 4).foreach { i =>
      val f = new File(d, f"img/$i%02d.png")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(png(i)) finally o.close()
    }
    val o = new FileOutputStream(new File(d, "head.onnx"))
    try o.write(TestOnnx.mlpBytes) finally o.close()
    d
  }

  private def imgPath(i: Int): String =
    new File(dir, f"img/$i%02d.png").getAbsolutePath

  test("ONNX filter in foreachBatch: one session load across >=2 " +
      "micro-batches, stream == batch scores") {
    val inDir = new File(dir, "in")
    // two separate appends → two files → two micro-batches at
    // maxFilesPerTrigger=1
    Seq((imgPath(0), "a"), (imgPath(1), "b")).toDF("image_path", "caption")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)
    Seq((imgPath(2), "c"), (imgPath(3), "d")).toDF("image_path", "caption")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)

    val modelFile = new File(dir, "head.onnx").getAbsolutePath
    val config = FilesConfig("/unused",
      Seq(FilePayload(Modality.Image, "image_path")))
    val schema = StructType(Seq(
      StructField("image_path", StringType),
      StructField("caption", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.getAbsolutePath)

    val loadsBefore = OnnxModel.loads.get()
    StreamingOnnxSink.scores.clear()
    StreamingOnnxSink.batches.set(0)
    val q = EventStreams.foreachBatchPipeline(stream, config, Seq(
      Pipeline.dataFilterStage(OnnxScoreFilter(Some(modelFile))))) {
      (processor, _) =>
        StreamingOnnxSink.batches.incrementAndGet()
        processor.df.select("image_path", "image_score").collect()
          .foreach(r => StreamingOnnxSink.scores.put(
            r.getString(0), r.getDouble(1)))
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(StreamingOnnxSink.batches.get() >= 2,
      s"expected >=2 micro-batches, got ${StreamingOnnxSink.batches.get()}")
    assert(StreamingOnnxSink.scores.size() == 4)
    // session reuse ACROSS micro-batches: at most one cold load in
    // this JVM for the whole stream
    val coldLoads = OnnxModel.loads.get() - loadsBefore
    assert(coldLoads <= 1,
      s"model parsed $coldLoads times across micro-batches — the " +
        "per-executor session cache must survive foreachBatch")
    // stream == batch: the same filter over the same rows as one
    // batch Processor produces identical scores
    val batchDf = Seq((imgPath(0), "a"), (imgPath(1), "b"),
      (imgPath(2), "c"), (imgPath(3), "d")).toDF("image_path", "caption")
    val batchScores = graft.operators.Processor(batchDf, config)
      .applyDataFilter(OnnxScoreFilter(Some(modelFile)))
      .df.select("image_path", "image_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(batchScores.size == 4)
    batchScores.foreach { case (p, s) =>
      assert(StreamingOnnxSink.scores.get(p) == s,
        s"stream/batch score mismatch for $p")
    }
  }
}
