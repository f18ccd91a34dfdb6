package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DatasetConfig
import graft.onnx.{Onnx, OnnxModel, TestOnnx}
import graft.sources.DatasetReader

/** OnnxPixelScoreFilter end-to-end: a REAL serialized conv-net .onnx
  * file scored over raw pixel tensors through Spark — the reference's
  * detector-model input mode (watermarks_filter.py:65-104), exercised
  * on the interpreter's CNN tier (Conv → pool → head).
  */
class OnnxPixelScoreFilterSpec extends SparkSpec {

  private def png(seed: Int): Array[Byte] = {
    val img = new BufferedImage(48, 20, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 48)
      img.setRGB(x, y, (x * 41 + y * 13 + seed * 55555) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-onnx-pixel").toFile
    val rows = (0 until 5).map { i =>
      val name = f"$i%02d.png"
      val bytes = if (i == 4) Array[Byte](9, 9, 9) else png(i)
      val f = new File(d, s"img/$name")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(bytes) finally o.close()
      s"img/$name,c$i"
    }
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(("image_path,caption" +: rows).mkString("\n")
      .getBytes("UTF-8")) finally o.close()
    d
  }

  /** x[N,3,8,8] → Conv(3→2, 3×3, pad 1) → Relu → GlobalAveragePool →
    * Flatten → Gemm([1,2], transB) → Sigmoid — a real (tiny) conv
    * detector head in genuine wire format. */
  private lazy val cnnBytes: Array[Byte] = {
    val convW = (0 until 2 * 3 * 3 * 3).map(i => ((i % 5) - 2) * 0.1f)
    val convB = Seq(0.05f, -0.05f)
    val fcW = Seq(0.8f, -0.6f)
    val fcB = Seq(0.1f)
    TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Conv", Seq("x", "cw", "cb"), Seq("c"),
          Seq(TestOnnx.attrInts("kernel_shape", Seq(3L, 3L)),
            TestOnnx.attrInts("pads", Seq(1L, 1L, 1L, 1L)))),
        TestOnnx.node("Relu", Seq("c"), Seq("r")),
        TestOnnx.node("GlobalAveragePool", Seq("r"), Seq("p")),
        TestOnnx.node("Flatten", Seq("p"), Seq("f")),
        TestOnnx.node("Gemm", Seq("f", "fw", "fb"), Seq("z"),
          Seq(TestOnnx.attrInt("transB", 1L))),
        TestOnnx.node("Sigmoid", Seq("z"), Seq("y"))),
      inits = Seq(
        TestOnnx.tensor("cw", Seq(2, 3, 3, 3), convW),
        TestOnnx.tensor("cb", Seq(2), convB),
        TestOnnx.tensor("fw", Seq(1, 2), fcW),
        TestOnnx.tensor("fb", Seq(1), fcB)),
      inputs = Seq("x"), outputs = Seq("y"))
  }

  private lazy val modelFile: String = {
    val f = new File(dir, "cnn.onnx")
    val o = new FileOutputStream(f)
    try o.write(cnnBytes) finally o.close()
    f.getAbsolutePath
  }

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  test("CNN scores flow from real pixels through Spark; corrupt rows null") {
    val filter = OnnxPixelScoreFilter(Some(modelFile), inputSize = 8,
      batchSize = 2)
    val rows = processor.applyDataFilter(filter).df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("image_cnn_score"))
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[Double])).toMap
    assert(rows.size == 5)
    assert(rows("04.png").isEmpty, "undecodable image must score null")
    // value check: each Spark-side score equals a driver-side forward
    // pass over the SAME preprocessing (decode → resize → CHW) —
    // pins batching, serialization, and row alignment; the conv math
    // itself is hand-verified in OnnxRuntimeSpec
    val model = OnnxModel.parseBytes(cnnBytes)
    (0 until 4).foreach { i =>
      val img = ImageIO.read(new ByteArrayInputStream(png(i)))
      val t = filter.pixelTensor(img)
      val want = model.forward(Onnx.Tensor(Seq(1, 3, 8, 8), t)).data(0)
      val got = rows(f"$i%02d.png").get
      assert(math.abs(got - want) < 1e-6, s"img $i: got $got want $want")
      assert(got > 0.0 && got < 1.0)
    }
    // the head must actually discriminate between different images
    val vals = (0 until 4).map(i => rows(f"$i%02d.png").get)
    assert(vals.distinct.length > 1, s"degenerate scores: $vals")
  }

  test("grayscale mode feeds a 1-channel plane") {
    // Conv(1→1, 1×1, identity weight) → GlobalAveragePool: the score
    // IS the mean luminance of the resized plane
    val m = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Conv", Seq("x", "w"), Seq("c"),
          Seq(TestOnnx.attrInts("kernel_shape", Seq(1L, 1L)))),
        TestOnnx.node("GlobalAveragePool", Seq("c"), Seq("p")),
        TestOnnx.node("Flatten", Seq("p"), Seq("y"))),
      inits = Seq(TestOnnx.tensor("w", Seq(1, 1, 1, 1), Seq(1f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val f = new File(dir, "gray.onnx")
    val o = new FileOutputStream(f)
    try o.write(m) finally o.close()
    val filter = OnnxPixelScoreFilter(Some(f.getAbsolutePath),
      scoreColumn = "mean_lum", inputSize = 8, grayscale = true)
    val rows = processor.applyDataFilter(filter).df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("mean_lum"))
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[Double])).toMap
    (0 until 4).foreach { i =>
      val t = filter.pixelTensor(
        ImageIO.read(new ByteArrayInputStream(png(i))))
      val want = t.sum / t.length
      assert(math.abs(rows(f"$i%02d.png").get - want) < 1e-5)
    }
  }

  test("no model path falls back to the deterministic stand-in") {
    val rows = processor
      .applyDataFilter(OnnxPixelScoreFilter(None, inputSize = 8))
      .df.select(col("image_cnn_score")).collect()
      .map(r => Option(r.get(0)))
    assert(rows.count(_.isDefined) == 4)
    rows.flatten.map(_.asInstanceOf[Double])
      .foreach(v => assert(v > 0.0 && v < 1.0))
  }

  test("determinism: identical runs produce identical scores") {
    val f = OnnxPixelScoreFilter(Some(modelFile), inputSize = 8)
    def run() = processor.applyDataFilter(f).df
      .select(col("image_path"), col("image_cnn_score"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(run() == run())
  }
}
