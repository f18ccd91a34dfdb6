package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Modality
import graft.onnx.{Onnx, OnnxModel, TestOnnx}

/** ClipLabelsFilter with REAL two-tower .onnx models: the label
  * embeddings come from one text-tower forward over every
  * label × template prompt (averaged per label), each batch costs one
  * image-tower pass, and the per-label scores match a driver-side
  * recomputation over the same preprocessing. */
class ClipLabelsOnnxSpec extends AnyFunSuite {

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

  private lazy val dir: File =
    Files.createTempDirectory("graft-clip-labels").toFile
  private def write(name: String, bytes: Array[Byte]): String = {
    val f = new File(dir, name)
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
    f.getAbsolutePath
  }
  private lazy val imgPath = write("cl_img_tower.onnx", imageTower)
  private lazy val txtPath = write("cl_txt_tower.onnx", textTower)

  private val labels = Seq("cat", "dog", "car")
  private val templates = Seq("a photo of a {label}", "{label}")

  private def filter = ClipLabelsFilter(labels, templates,
    imageModelPath = Some(imgPath), textModelPath = Some(txtPath),
    inputSize = 8, vocabSize = V, maxTokens = L, batchSize = 2)

  test("real towers: per-label scores match driver recomputation") {
    val f = filter
    val inputs = (0 until 3).map(i => FilterInput(s"k$i",
      Map(Modality.Image.name -> png(i)), Map.empty)) :+
      FilterInput("bad", Map(Modality.Image.name -> Array[Byte](7)), Map.empty)
    val res = f.processBatch(inputs)
    assert(res.length == 4)
    assert(res(3).get.forall(_ == null), "corrupt image must fan out nulls")

    // independent recomputation from the serialized model bytes
    val tm = OnnxModel.parseBytes(textTower)
    val im = OnnxModel.parseBytes(imageTower)
    val pix = OnnxPixelScoreFilter(inputSize = 8)
    val labelVecs = labels.map { l =>
      val sum = new Array[Double](E)
      templates.foreach { t =>
        val ids = Towers.tokenIds(t.replace("{label}", l), V, L)
        val e = tm.forward(Onnx.Tensor(Seq(1, L), ids))
        (0 until E).foreach(j => sum(j) += e.data(j))
      }
      sum.map(v => (v / templates.length).toFloat)
    }
    (0 until 3).foreach { i =>
      val img = ImageIO.read(new ByteArrayInputStream(png(i)))
      val ie = im.forward(Onnx.Tensor(Seq(1, 3, 8, 8), pix.pixelTensor(img)))
      val got = res(i).get.map(_.asInstanceOf[Double])
      val want = labelVecs.map(lv =>
        Towers.cosine01(ie.data, 0, lv, 0, E))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-6, s"row $i: $g vs $w")
      }
      assert(got.distinct.length > 1, s"labels degenerate on row $i: $got")
    }
  }

  test("batched rows score identically to singleton batches") {
    val f = filter
    val ins = (0 until 3).map(i => FilterInput(s"k$i",
      Map(Modality.Image.name -> png(i)), Map.empty))
    val together = f.processBatch(ins)
    val alone = ins.map(in => f.processBatch(Seq(in)).head)
    assert(together == alone)
  }

  test("single-tower configuration is rejected") {
    intercept[IllegalArgumentException] {
      ClipLabelsFilter(labels, imageModelPath = Some("x.onnx"))
    }
  }

  test("no model paths keep the deterministic stand-in scores") {
    val plain = ClipLabelsFilter(labels, templates)
    val in = FilterInput("k",
      Map(Modality.Image.name -> png(1)), Map.empty)
    val a = plain.processBatch(Seq(in))
    val b = plain.processBatch(Seq(in))
    assert(a == b)
    assert(a.head.get.length == labels.length)
    // and the ONNX-backed filter genuinely disagrees with the stand-in
    assert(filter.processBatch(Seq(in)) != a)
  }
}
