package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DatasetConfig
import graft.onnx.{OnnxModel, TestOnnx}
import graft.sources.DatasetReader

/** OnnxScoreFilter end-to-end: a REAL serialized .onnx file (written
  * by the test in genuine protobuf wire format), loaded once per JVM,
  * scoring image batches through Spark with null-on-undecodable —
  * the reference's aesthetic/NSFW session discipline.
  */
class OnnxScoreFilterSpec extends SparkSpec {

  private def png(seed: Int): Array[Byte] = {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 77777) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-onnx-filter").toFile
    val rows = (0 until 6).map { i =>
      val name = f"$i%02d.png"
      val bytes = if (i == 5) Array[Byte](1, 2, 3) else png(i)
      val f = new File(d, s"img/$name")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(bytes) finally o.close()
      s"img/$name,c$i"
    }
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(("image_path,caption" +: rows).mkString("\n")
      .getBytes("UTF-8")) finally o.close()
    o.close()
    d
  }

  private lazy val modelFile: String = {
    val f = new File(dir, "head.onnx")
    val o = new FileOutputStream(f)
    try o.write(TestOnnx.mlpBytes) finally o.close()
    f.getAbsolutePath
  }

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  test("scores come from the real ONNX forward pass; corrupt rows null") {
    val filter = OnnxScoreFilter(Some(modelFile), batchSize = 2)
    val rows = processor.applyDataFilter(filter).df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("image_score"))
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[Double])).toMap
    assert(rows.size == 6)
    assert(rows("05.png").isEmpty, "undecodable image must score null")
    // value check: score equals sigmoid(MLP(featurize(img))) computed
    // independently from the known weights
    (0 until 5).foreach { i =>
      val img = ImageIO.read(new ByteArrayInputStream(png(i)))
      val want = TestOnnx.expectedScore(filter.featurize(img).toSeq)
      val got = rows(f"$i%02d.png").get
      assert(math.abs(got - want) < 1e-5, s"img $i: got $got want $want")
      assert(got > 0.0 && got < 1.0)
    }
  }

  test("the session loads once per JVM across tasks and batches") {
    val before = OnnxModel.loads.get()
    val filter = OnnxScoreFilter(Some(modelFile), batchSize = 2)
    // 6 rows, batchSize 2, 4 test threads → several batches + tasks
    processor.applyDataFilter(filter).df.collect()
    processor.applyDataFilter(filter).df.collect()
    val coldLoads = OnnxModel.loads.get() - before
    assert(coldLoads <= 1,
      s"model parsed $coldLoads times — session must be cached per JVM")
  }

  test("no model path falls back to the deterministic stand-in head") {
    val rows = processor
      .applyDataFilter(OnnxScoreFilter(None))
      .df.select(col("image_score")).collect().map(r => Option(r.get(0)))
    assert(rows.count(_.isDefined) == 5)
    // fallback agrees with ImageScoreFilter's algebraic head up to
    // the float32 quantization of the model-input feature vector
    val standin = processor.applyDataFilter(ImageScoreFilter()).df
      .select(col("image_score")).collect().map(r => Option(r.get(0)))
    rows.zip(standin).foreach {
      case (Some(a: Double), Some(b: Double)) =>
        assert(math.abs(a - b) < 1e-6, s"$a vs $b")
      case (a, b) => assert(a == b)
    }
  }

  test("2-class softmax head: nsfw-style filter scores class-1 probability") {
    // x[N,4] → Gemm(W[4,2]) → Softmax → p; class-1 prob is the score
    val w = TestOnnx.tensor("w", Seq(2, 4),
      Seq(0.5f, -0.25f, 1f, 0f, -0.5f, 0.25f, -1f, 0f))
    val m = TestOnnx.model(
      nodes = Seq(
        TestOnnx.node("Gemm", Seq("x", "w"), Seq("z"),
          Seq(TestOnnx.attrInt("transB", 1L))),
        TestOnnx.node("Softmax", Seq("z"), Seq("p"))),
      inits = Seq(w), inputs = Seq("x"), outputs = Seq("p"))
    val f2 = new File(dir, "nsfw.onnx")
    val o = new FileOutputStream(f2)
    try o.write(m) finally o.close()
    val filter = ScoreFilters.nsfw(Some(f2.getAbsolutePath))
    assert(filter.resultSchema.fieldNames.toSeq == Seq("nsfw_score"))
    val rows = processor.applyDataFilter(filter).df
      .select(col("nsfw_score")).collect().map(r => Option(r.get(0)))
    val scored = rows.flatten.map(_.asInstanceOf[Double])
    assert(scored.length == 5)
    // softmax pair probabilities: each in (0,1); p0 + p1 = 1 means
    // class-1 score is 1 - class-0 score — check via outputIndex 0
    val p0 = processor.applyDataFilter(
      OnnxScoreFilter(Some(f2.getAbsolutePath), "p0", outputIndex = 0))
      .df.select(col("p0")).collect().flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Double])
    scored.sorted.zip(p0.sorted.reverse).foreach { case (p1, q0) =>
      assert(math.abs(p1 + q0 - 1.0) < 1e-6)
    }
  }

  test("named family: reference column names and shared plumbing") {
    assert(ScoreFilters.aesthetic(None).resultSchema.fieldNames.toSeq ==
      Seq("aesthetic_score"))
    assert(ScoreFilters.improvedAesthetic(None)
      .resultSchema.fieldNames.toSeq == Seq("improved_aesthetic_score"))
    assert(ScoreFilters.watermark(None).resultSchema.fieldNames.toSeq ==
      Seq("watermark_score"))
    assert(ScoreFilters.nsfw(None).outputIndex == 1)
  }

  test("determinism: identical runs produce identical scores") {
    val f = OnnxScoreFilter(Some(modelFile))
    def run() = processor.applyDataFilter(f).df
      .select(col("image_path"), col("image_score"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(run() == run())
  }
}
