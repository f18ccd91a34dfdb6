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

/** OnnxCaptionFilter end-to-end: a real vision encoder + a real
  * two-input decoder (.onnx) greedy-decoded into caption text
  * through Spark — the BLIP captioning loop at toy scale. */
class OnnxCaptionFilterSpec extends SparkSpec {

  private val E = 4
  private val V = 8 // ids: 0 pad, 1 bos, 2 eos, 3..7 words
  private val L = 8
  private val vocab = Seq("red", "blue", "bright", "dark", "scene")

  private def png(kind: Int): Array[Byte] = {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val rgb = kind match {
        case 0 => 0x000000
        case 1 => 0xffffff
        case 2 => 0xff0000
        case _ => (x * 97 + y * 31 + kind * 7777) & 0xffffff
      }
      img.setRGB(x, y, rgb)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-onnx-caption").toFile
    val rows = (0 until 5).map { i =>
      val name = f"$i%02d.png"
      val bytes = if (i == 4) Array[Byte](3) else png(i)
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

  // quadratic term matters: a LINEAR generator mod m makes any two
  // embedding rows differ by a constant vector, which downstream
  // heads can map to an argmax-invariant logit shift — the prompt
  // test would pass or fail by accident of that structure
  private def seeded(n: Int, salt: Int): Seq[Float] =
    (0 until n).map(i =>
      (((i.toLong * i * 40503L + i * 2654435761L + salt * 7919L) % 13)
        - 6) * 0.21f)

  private lazy val visionTower: Array[Byte] = TestOnnx.model(
    nodes = Seq(
      TestOnnx.node("Conv", Seq("x", "cw"), Seq("c"),
        Seq(TestOnnx.attrInts("kernel_shape", Seq(1L, 1L)))),
      TestOnnx.node("GlobalAveragePool", Seq("c"), Seq("p")),
      TestOnnx.node("Flatten", Seq("p"), Seq("f")),
      TestOnnx.node("Gemm", Seq("f", "w"), Seq("y"),
        Seq(TestOnnx.attrInt("transB", 1L)))),
    inits = Seq(
      TestOnnx.tensor("cw", Seq(2, 3, 1, 1), seeded(6, 1)),
      TestOnnx.tensor("w", Seq(E, 2), seeded(2 * E, 2))),
    inputs = Seq("x"), outputs = Seq("y"))

  /** ids→Gather→+pos→+img→+mean-of-all-token-embeddings (a
    * non-causal context mix so every position SEES the prompt
    * tokens — real decoders mix causally via attention, which the
    * interpreter also runs; the mean keeps the reference computation
    * in the test tractable)→Gelu→MatMul→[1,L,V]. */
  private lazy val decoder: Array[Byte] = TestOnnx.model(
    nodes = Seq(
      TestOnnx.node("Gather", Seq("temb", "ids"), Seq("g")),
      TestOnnx.node("Transpose", Seq("g"), Seq("gt"),
        Seq(TestOnnx.attrInts("perm", Seq(0L, 2L, 1L)))),
      TestOnnx.node("ReduceMean", Seq("gt"), Seq("cm"),
        Seq(TestOnnx.attrInts("axes", Seq(-1L)),
          TestOnnx.attrInt("keepdims", 1L))),
      TestOnnx.node("Transpose", Seq("cm"), Seq("ctx0"),
        Seq(TestOnnx.attrInts("perm", Seq(0L, 2L, 1L)))),
      // amplified so a one-token prompt difference (1/L of the mean)
      // reliably crosses argmax gaps in the toy logit space
      TestOnnx.node("Mul", Seq("ctx0", "cscale"), Seq("ctx")),
      TestOnnx.node("Add", Seq("g", "pos"), Seq("gp")),
      TestOnnx.node("Add", Seq("gp", "ctx"), Seq("gc")),
      TestOnnx.node("Unsqueeze", Seq("img", "one"), Seq("iu")),
      TestOnnx.node("Add", Seq("gc", "iu"), Seq("h")),
      TestOnnx.node("Gelu", Seq("h"), Seq("a")),
      TestOnnx.node("MatMul", Seq("a", "wout"), Seq("y"))),
    inits = Seq(
      TestOnnx.tensor("temb", Seq(V, E), seeded(V * E, 3)),
      TestOnnx.tensor("pos", Seq(L, E), seeded(L * E, 4)),
      TestOnnx.tensor("one", Seq(1), Seq(1f)),
      TestOnnx.tensor("cscale", Seq(1), Seq(9f)),
      TestOnnx.tensor("wout", Seq(E, V), seeded(E * V, 5))),
    inputs = Seq("img", "ids"), outputs = Seq("y"))

  private def write(name: String, bytes: Array[Byte]): String = {
    val f = new File(dir, name)
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
    f.getAbsolutePath
  }
  private lazy val vPath = write("vision.onnx", visionTower)
  private lazy val dPath = write("decoder.onnx", decoder)

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  private def filter = OnnxCaptionFilter(Some(vPath), Some(dPath),
    vocab, inputSize = 16, maxTokens = L, batchSize = 2)

  test("greedy decode produces vocab captions through Spark; corrupt null") {
    val rows = processor.applyDataFilter(filter).df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("blip_caption"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows.size == 5)
    assert(rows("04.png").isEmpty, "undecodable image must caption null")
    val caps = (0 until 4).map(i => rows(f"$i%02d.png").get)
    caps.foreach { c =>
      val words = c.split(" ").filter(_.nonEmpty)
      assert(words.length <= L - 1)
      words.foreach(w => assert(vocab.contains(w), s"$w not in vocab ($c)"))
    }
    // the decode is conditioned on the image: distinct inputs must
    // not collapse to one caption
    assert(caps.distinct.length > 1, s"unconditioned decode: $caps")
    // driver-side replication of the same greedy loop
    val f = filter
    val vm = OnnxModel.parseBytes(visionTower)
    val dm = OnnxModel.parseBytes(decoder)
    (0 until 4).foreach { i =>
      val img = ImageIO.read(new ByteArrayInputStream(png(i)))
      assert(f.decode(vm, dm, img) == rows(f"$i%02d.png").get)
    }
  }

  test("decode is deterministic across runs") {
    def run() = processor.applyDataFilter(filter).df
      .select(col("image_path"), col("blip_caption"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(run() == run())
  }

  test("no model paths fall back to the measured-statistics captioner") {
    val got = processor.applyDataFilter(OnnxCaptionFilter())
      .df.select(col("image_path"), col("blip_caption"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    val want = processor.applyDataFilter(CaptionFilter())
      .df.select(col("image_path"), col("blip_caption"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == want)
  }

  test("mismatched single-model configuration is rejected") {
    intercept[IllegalArgumentException] {
      OnnxCaptionFilter(visionModelPath = Some("v.onnx"))
    }
  }

  test("llava prompting: reference column name, prompt in the context") {
    val f1 = OnnxCaptionFilter.llava(Some(vPath), Some(dPath),
      prompt = "short", vocab = vocab, maxTokens = L)
    assert(f1.resultSchema.fieldNames.toSeq ==
      Seq("caption llava prompt short"))
    val f2 = OnnxCaptionFilter.llava(Some(vPath), Some(dPath),
      prompt = "colors", vocab = vocab, maxTokens = L)
    val vm = OnnxModel.parseBytes(visionTower)
    val dm = OnnxModel.parseBytes(decoder)
    // the prompt is part of the decode context: different prompts
    // must be able to steer generation (position embeddings shift)
    val img = ImageIO.read(new ByteArrayInputStream(png(3)))
    val c1 = f1.decode(vm, dm, img)
    val c2 = f2.decode(vm, dm, img)
    assert(c1 != c2, s"prompt had no effect: '$c1'")
    // and the loop is still deterministic per prompt
    assert(f1.decode(vm, dm, img) == c1)
  }

  test("a prompt longer than the token budget is rejected loudly") {
    intercept[IllegalArgumentException] {
      OnnxCaptionFilter.llava(Some(vPath), Some(dPath),
        prompt = Seq.fill(L)("word").mkString(" "), maxTokens = L)
    }
  }
}
