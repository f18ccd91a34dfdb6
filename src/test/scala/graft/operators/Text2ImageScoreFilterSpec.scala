package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.core._
import graft.sources.DatasetReader

/** The text2image (caption↔image agreement) contract: deterministic
  * two-tower scoring, caption metadata plumbed through the
  * applyDataFilter merge, null on undecodable image OR missing
  * caption, and caption-sensitivity (different captions move the
  * score while the same inputs reproduce it exactly).
  */
class Text2ImageScoreFilterSpec extends SparkSpec {

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val gradient = png(32, 32)((x, y) => (x * 8) << 16 | (y * 8))

  test("deterministic and caption-sensitive") {
    val f = Text2ImageScoreFilter()
    def scoreOf(caption: String): Option[Double] =
      f.processBatch(Seq(FilterInput("k0",
        Map(Modality.Image.name -> gradient),
        Map("caption" -> caption))))
        .head.get.head match {
        case null => None
        case d => Some(d.asInstanceOf[Double])
      }
    val a = scoreOf("a red gradient over black")
    val b = scoreOf("completely unrelated words entirely")
    assert(a == scoreOf("a red gradient over black"), "must be deterministic")
    assert(a.isDefined && b.isDefined)
    assert(a.get >= 0.0 && a.get <= 1.0 && b.get >= 0.0 && b.get <= 1.0)
    assert(a.get != b.get, "different captions must move the score")
  }

  test("caption metadata rides applyDataFilter; nulls on broken inputs") {
    val d = Files.createTempDirectory("graft-t2i").toFile
    val rows = Seq(
      ("a.png", gradient, "a red and blue gradient"),
      ("b.png", gradient, ""), // empty caption → null score
      ("c.png", Array[Byte](9, 9, 9), "corrupt image")) // → null score
    rows.foreach { case (name, bytes, _) =>
      val f = new File(d, s"m/$name"); f.getParentFile.mkdirs()
      val os = new FileOutputStream(f); os.write(bytes); os.close()
    }
    val os = new FileOutputStream(new File(d, "data.csv"))
    os.write(("image_path,caption" +:
      rows.map { case (n, _, c) => s"m/$n,$c" }).mkString("\n")
      .getBytes("UTF-8"))
    os.close()
    val proc = DatasetReader.readFiles(spark,
      DatasetConfig.filesImageText(new File(d, "data.csv").getAbsolutePath))
    // readFiles canonicalizes the caption column to `text`
    val out = proc.applyDataFilter(Text2ImageScoreFilter("text")).df
      .select("image_path", "t2i_score").collect()
      .map(r => new File(r.getString(0)).getName ->
        Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out.size == 3, "no row drops — null is the error signal")
    assert(out("a.png").isDefined)
    assert(out("b.png").isEmpty, "empty caption must score null")
    assert(out("c.png").isEmpty, "corrupt image must score null")
  }
}
