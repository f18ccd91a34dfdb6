package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.core._
import graft.sources.DatasetReader

/** The model-backed image-scoring contract on generated fixtures:
  * the deterministic head must be reproducible run-to-run, must
  * order a flat gray frame below a high-contrast colorful one
  * (contrast and colorfulness carry positive weights), must null out
  * undecodable payloads instead of dropping rows, and must ride the
  * standard applyDataFilter 1:1 merge.
  */
class ImageScoreFilterSpec extends SparkSpec {

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val flatGray = png(32, 32)((_, _) => 0x808080)
  private val checkerColor = png(32, 32)((x, y) =>
    if ((x / 4 + y / 4) % 2 == 0) 0xff2010 else 0x10ff40)

  test("deterministic, and contrast+color outscore flat gray") {
    val f = ImageScoreFilter()
    def scoreOf(bytes: Array[Byte]): Double =
      f.processBatch(Seq(FilterInput("k0",
        Map(Modality.Image.name -> bytes), Map.empty)))
        .head.get.head.asInstanceOf[Double]
    val gray = scoreOf(flatGray)
    val busy = scoreOf(checkerColor)
    assert(scoreOf(flatGray) == gray, "must be deterministic")
    assert(busy > gray, s"busy $busy should outscore flat $gray")
    assert(gray >= 0.0 && busy <= 1.0)
  }

  test("undecodable payload scores null through applyDataFilter") {
    val d = Files.createTempDirectory("graft-imgscore").toFile
    val imgs = Seq(
      "a.png" -> flatGray,
      "b.png" -> checkerColor,
      "c.png" -> Array[Byte](1, 2, 3)) // corrupt
    imgs.foreach { case (name, bytes) =>
      val f = new File(d, s"m/$name"); f.getParentFile.mkdirs()
      val os = new FileOutputStream(f); os.write(bytes); os.close()
    }
    val os = new FileOutputStream(new File(d, "data.csv"))
    os.write(("image_path,caption" +:
      imgs.map { case (n, _) => s"m/$n,cap" }).mkString("\n")
      .getBytes("UTF-8"))
    os.close()
    val proc = DatasetReader.readFiles(spark,
      DatasetConfig.filesImageText(new File(d, "data.csv").getAbsolutePath))
    val out = proc.applyDataFilter(ImageScoreFilter()).df
      .select("image_path", "image_score").collect()
      .map(r => new File(r.getString(0)).getName ->
        Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out.size == 3, "no row drops — null is the error signal")
    assert(out("c.png").isEmpty, "corrupt image must score null")
    assert(out("b.png").get > out("a.png").get)
  }
}
