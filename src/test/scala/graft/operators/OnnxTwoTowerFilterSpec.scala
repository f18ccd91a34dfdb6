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

/** OnnxTwoTowerFilter end-to-end: a conv image tower and a
  * Gather-embedding text tower (both REAL serialized .onnx) scored
  * as caption↔image cosine through Spark — the CLIP-family contract
  * on the interpreter's CNN + attention tiers. */
class OnnxTwoTowerFilterSpec extends SparkSpec {

  private val E = 4 // embedding width
  private val V = 512 // hashing-tokenizer vocab (test-sized)
  private val L = 6 // max tokens

  private def png(seed: Int): Array[Byte] = {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (x * 37 + y * 101 + seed * 99991) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-two-tower").toFile
    val captions = Seq("a red bird", "blue sea waves", "city at night",
      "", "mountain trail") // row 3: missing caption
    val rows = (0 until 5).map { i =>
      val name = f"$i%02d.png"
      val bytes = if (i == 4) Array[Byte](7) else png(i) // row 4: corrupt
      val f = new File(d, s"img/$name")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(bytes) finally o.close()
      s"img/$name,${captions(i)}"
    }
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(("image_path,caption" +: rows).mkString("\n")
      .getBytes("UTF-8")) finally o.close()
    d
  }

  /** Conv(3→2, 1×1) → GlobalAveragePool → Flatten → Gemm → [N, E]. */
  private lazy val imageTower: Array[Byte] = TestOnnx.model(
    nodes = Seq(
      TestOnnx.node("Conv", Seq("x", "cw"), Seq("c"),
        Seq(TestOnnx.attrInts("kernel_shape", Seq(1L, 1L)))),
      TestOnnx.node("GlobalAveragePool", Seq("c"), Seq("p")),
      TestOnnx.node("Flatten", Seq("p"), Seq("f")),
      TestOnnx.node("Gemm", Seq("f", "w"), Seq("y"),
        Seq(TestOnnx.attrInt("transB", 1L)))),
    inits = Seq(
      TestOnnx.tensor("cw", Seq(2, 3, 1, 1),
        Seq(0.5f, 0.3f, 0.2f, -0.4f, 0.9f, -0.5f)),
      TestOnnx.tensor("w", Seq(E, 2),
        (0 until 2 * E).map(i => ((i % 3) - 1) * 0.6f))),
    inputs = Seq("x"), outputs = Seq("y"))

  /** Gather(emb) → [N,L,E] → Transpose → ReduceMean over L → [N, E]. */
  private lazy val textTower: Array[Byte] = TestOnnx.model(
    nodes = Seq(
      TestOnnx.node("Gather", Seq("emb", "ids"), Seq("g")),
      TestOnnx.node("Transpose", Seq("g"), Seq("t"),
        Seq(TestOnnx.attrInts("perm", Seq(0L, 2L, 1L)))),
      TestOnnx.node("ReduceMean", Seq("t"), Seq("y"),
        Seq(TestOnnx.attrInts("axes", Seq(-1L)),
          TestOnnx.attrInt("keepdims", 0L)))),
    inits = Seq(TestOnnx.tensor("emb", Seq(V, E),
      (0 until V * E).map(i =>
        (((i * 2654435761L) % 13) - 6).toFloat * 0.15f))),
    inputs = Seq("ids"), outputs = Seq("y"))

  private def write(name: String, bytes: Array[Byte]): String = {
    val f = new File(dir, name)
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
    f.getAbsolutePath
  }
  private lazy val imgPath = write("img_tower.onnx", imageTower)
  private lazy val txtPath = write("txt_tower.onnx", textTower)

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  // the reader canonicalizes the caption column to `text`
  private def filter = OnnxTwoTowerFilter(
    Some(imgPath), Some(txtPath), captionColumn = "text",
    inputSize = 8, vocabSize = V, maxTokens = L, batchSize = 2)

  test("two real towers score through Spark; corrupt/missing rows null") {
    val rows = processor.applyDataFilter(filter).df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("t2i_model_score"))
      .collect()
      .map(r => r.getString(0) -> Option(r.get(1))
        .map(_.asInstanceOf[Double])).toMap
    assert(rows.size == 5)
    assert(rows("03.png").isEmpty, "missing caption must score null")
    assert(rows("04.png").isEmpty, "corrupt image must score null")
    // driver-side recomputation over the same preprocessing
    val f = filter
    val im = OnnxModel.parseBytes(imageTower)
    val tm = OnnxModel.parseBytes(textTower)
    val captions = Seq("a red bird", "blue sea waves", "city at night")
    (0 until 3).foreach { i =>
      val img = ImageIO.read(new ByteArrayInputStream(png(i)))
      val ie = im.forward(Onnx.Tensor(Seq(1, 3, 8, 8), f.pixelProbe(img)))
      val te = tm.forward(Onnx.Tensor(Seq(1, L), f.tokenIds(captions(i))))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until E).foreach { j =>
        dot += ie.data(j).toDouble * te.data(j)
        na += ie.data(j).toDouble * ie.data(j)
        nb += te.data(j).toDouble * te.data(j)
      }
      val want = (1.0 + dot / (math.sqrt(na) * math.sqrt(nb))) * 0.5
      val got = rows(f"$i%02d.png").get
      assert(math.abs(got - want) < 1e-6, s"row $i: $got vs $want")
      assert(got > 0.0 && got < 1.0)
    }
    // different (image, caption) pairs must not collapse to one score
    val vals = (0 until 3).map(i => rows(f"$i%02d.png").get)
    assert(vals.distinct.length > 1, s"degenerate: $vals")
  }

  test("no model paths fall back to the deterministic stand-in towers") {
    val got = processor.applyDataFilter(
      OnnxTwoTowerFilter(captionColumn = "text"))
      .df.select(col("image_path"), col("t2i_model_score"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    val want = processor.applyDataFilter(Text2ImageScoreFilter("text"))
      .df.select(col("image_path"), col("t2i_score"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == want)
  }

  test("tokenizer: pad id 0, stable ids in [1, vocab)") {
    val f = filter
    val ids = f.tokenIds("Red RED red")
    assert(ids.length == L)
    assert(ids(0) == ids(1) && ids(1) == ids(2), "case-folded ids differ")
    assert(ids(3) == 0f && ids(5) == 0f, "padding must be id 0")
    assert(ids(0) >= 1f && ids(0) < V)
    assert(f.tokenIds("red red red").toSeq == ids.toSeq)
  }

  test("mismatched single-tower configuration is rejected") {
    intercept[IllegalArgumentException] {
      OnnxTwoTowerFilter(imageModelPath = Some("x.onnx"))
    }
  }
}
