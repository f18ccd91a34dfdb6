package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DatasetConfig
import graft.onnx.TestOnnx
import graft.sources.DatasetReader

/** The round-4 verdict's CRAFT/OCR upgrade: both OCR-pipeline stages
  * running REAL serialized `.onnx` heads end-to-end —
  * [[TextDetectionFilter]] on a conv score-map net (the CRAFT shape)
  * and [[OcrFilter]] on a CTC sequence head (the CRNN shape) — with
  * the stand-ins untouched as the no-model fallback.
  */
class OcrOnnxSpec extends SparkSpec {

  private val S = 64 // page size == detector input (no resize skew)

  private def page(bands: Seq[Int]): BufferedImage = {
    val img = new BufferedImage(S, S, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until S; x <- 0 until S) img.setRGB(x, y, 0xffffff)
    bands.foreach { by =>
      for (y <- by until math.min(by + 6, S); x <- 4 until S - 4)
        if ((x / 3) % 2 == 0) img.setRGB(x, y, 0x000000)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-ocr-onnx").toFile
    val pages = Seq(
      "text1.png" -> png(page(Seq(8, 24))),
      "text2.png" -> png(page(Seq(40))),
      "blank.png" -> png(page(Nil)))
    pages.foreach { case (n, b) =>
      val f = new File(d, s"img/$n")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(b) finally o.close()
    }
    val csv = "image_path,caption\n" +
      pages.map(p => s"img/${p._1},c").mkString("\n")
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(csv.getBytes("UTF-8")) finally o.close()
    d
  }

  /** Darkness detector in genuine wire format: [N,3,S,S] →
    * Conv(3→1, 3×3, VALID padding, every weight −4/27, bias 3) →
    * Sigmoid → [N, 1, S−2, S−2] score map. Flat white neighborhoods
    * score σ(−1) ≈ 0.27; striped text bands (≈half black) score
    * σ(+1) ≈ 0.73. Valid (not zero) padding keeps the white border
    * from reading as dark content. */
  private lazy val detectorPath: String = {
    val bytes = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Conv", Seq("x", "cw", "cb"), Seq("c"),
          Seq(TestOnnx.attrInts("kernel_shape", Seq(3L, 3L)))),
        TestOnnx.node("Sigmoid", Seq("c"), Seq("y"))),
      inits = Seq(
        TestOnnx.tensor("cw", Seq(1, 3, 3, 3),
          Seq.fill(27)(-4f / 27f)),
        TestOnnx.tensor("cb", Seq(1), Seq(3f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val f = new File(dir, "detector.onnx")
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
    f.getAbsolutePath
  }

  /** CTC recognizer in genuine wire format: [M,1,32,32] → Flatten →
    * Gemm → Reshape [M, 2, 38]. Timestep 0 elects 'h' by bias;
    * timestep 1 elects 'i' iff the crop's mean intensity clears the
    * blank bias (2·mean vs 0.5) — input-sensitive, so the spec
    * proves the net runs on the actual crop pixels. */
  private lazy val recognizerPath: String = {
    val alpha = OcrFilters.DefaultAlphabet
    val C = alpha.length + 1 // 38 with blank at 0
    val T = 2
    val hw = 32 * 32
    val w = Array.fill(T * C * hw)(0f)
    val b = Array.fill(T * C)(0f)
    b(0 * C + (alpha.indexOf('h') + 1)) = 1f // t0: 'h' by bias
    val iRow = 1 * C + (alpha.indexOf('i') + 1)
    for (j <- 0 until hw) w(iRow * hw + j) = 2f / hw // t1: 'i' ∝ mean
    b(1 * C + 0) = 0.5f // t1 blank bias — dark-zero crops say "h"
    val bytes = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Flatten", Seq("x"), Seq("f")),
        TestOnnx.node("Gemm", Seq("f", "w", "b"), Seq("z"),
          Seq(TestOnnx.attrInt("transB", 1L))),
        TestOnnx.node("Reshape", Seq("z", "shape"), Seq("y"))),
      inits = Seq(
        TestOnnx.tensor("w", Seq(T * C, hw), w.toSeq),
        TestOnnx.tensor("b", Seq(T * C), b.toSeq),
        TestOnnx.tensor("shape", Seq(3), Seq(-1f, T.toFloat, C.toFloat))),
      inputs = Seq("x"), outputs = Seq("y"))
    val f = new File(dir, "recognizer.onnx")
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
    f.getAbsolutePath
  }

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  test("ONNX detector: score-map boxes land on the text bands only") {
    val det = TextDetectionFilter(modelPath = Some(detectorPath),
      inputSize = S)
    val imgs = Seq(page(Seq(8, 24)), page(Nil))
    val res = det.processBatch(imgs.map(i => FilterInput("k",
      Map(graft.core.Modality.Image.name -> png(i)), Map.empty)))
    val boxes1 = OcrFilters.boxesFromJson(
      res.head.get.apply(2).asInstanceOf[String])
    assert(boxes1.nonEmpty, "band page must detect boxes")
    // valid conv offsets the 62×62 map by 1px and the box scale-back
    // stretches by 64/62 — bands at rows 8..13 and 24..29 land
    // within [5, 15] and [21, 31]
    assert(boxes1.forall { case (_, y0, _, y1) =>
      (y0 >= 5 && y1 <= 15) || (y0 >= 21 && y1 <= 31) },
      s"boxes off the bands: $boxes1")
    assert(res(1).get.apply(1) == 0, "blank page must detect nothing")
  }

  test("two-stage ONNX pipeline: real detector feeds real CTC recognizer") {
    val stages = Seq(
      Pipeline.dataFilterStage(TextDetectionFilter(
        modelPath = Some(detectorPath), inputSize = S)),
      Pipeline.dataFilterStage(OcrFilter(
        modelPath = Some(recognizerPath))))
    val result = Pipeline.run(processor, stages)
    assert(result.failed.isEmpty, result.failed.toString)
    val rows = result.processor.df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("n_boxes"), col("ocr_texts"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getSeq[String](2)))).toMap
    val (n1, t1) = rows("text1.png")
    assert(n1 > 0 && t1.length == n1, "one decoded string per box")
    // bright crops (mean > 0.25) decode "hi"; dark mostly-stripe
    // crops fall to the blank bias at t1 and decode "h" — BOTH occur
    // on this page, which proves the net reads the actual pixels
    assert(t1.forall(t => t == "hi" || t == "h"),
      s"unexpected CTC decodes: $t1")
    assert(t1.contains("hi") && t1.contains("h"),
      s"expected input-sensitive decodes, got uniform: ${t1.distinct}")
    assert(rows("blank.png") == ((0, Seq.empty[String])))
    // determinism across a rerun on fresh sessions
    val again = Pipeline.run(processor, stages).processor.df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("ocr_texts"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(again("text1.png") == t1)
  }

  test("model failure fails the TASK loudly — never a silent digest " +
      "or a corpus of error rows") {
    // recognizer head with an impossible class count for the alphabet
    val bad = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Flatten", Seq("x"), Seq("f")),
        TestOnnx.node("Gemm", Seq("f", "w", "b"), Seq("y"),
          Seq(TestOnnx.attrInt("transB", 1L)))),
      inits = Seq(
        TestOnnx.tensor("w", Seq(99, 32 * 32),
          Seq.fill(99 * 32 * 32)(0.01f)),
        TestOnnx.tensor("b", Seq(99), Seq.fill(99)(0f))),
      inputs = Seq("x"), outputs = Seq("y"))
    val f = new File(dir, "bad.onnx")
    val o = new FileOutputStream(f)
    try o.write(bad.toArray) finally o.close()
    val ocr = OcrFilter(modelPath = Some(f.getAbsolutePath))
    // the OnnxScoreFilter contract: a broken MODEL fails the task
    // (per-row errors are reserved for bad data) — a typo'd model
    // over a 100M-image corpus must not "succeed" as error rows
    val e = intercept[Exception] {
      ocr.processBatch(Seq(FilterInput("k",
        Map(graft.core.Modality.Image.name -> png(page(Seq(8)))),
        Map("text_boxes" -> "[[4,8,60,14]]"))))
    }
    assert(e.getMessage.contains("classes"),
      s"expected a loud class-count error, got: ${e.getMessage}")
  }
}
