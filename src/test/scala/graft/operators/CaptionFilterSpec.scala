package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Modality

/** Captioning contract: deterministic, content-sensitive captions
  * with the reference's column naming, null-on-undecodable, and the
  * video shape through the frame adapter. */
class CaptionFilterSpec extends AnyFunSuite {

  private def png(rgb: Int, w: Int = 48, h: Int = 32): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def in(key: String, bytes: Array[Byte]) =
    FilterInput(key, Map(Modality.Image.name -> bytes), Map.empty)

  test("captions describe measured content and are deterministic") {
    val f = CaptionFilters.blip()
    val res = f.processBatch(Seq(
      in("dark", png(0x101010)),
      in("bright-blue", png(0x2020f0)),
      in("bad", Array[Byte](1, 2))))
    val dark = res(0).get.head.asInstanceOf[String]
    val blue = res(1).get.head.asInstanceOf[String]
    assert(dark.contains("dark") && dark.contains("48x32"))
    assert(blue.contains("blue-toned"))
    assert(dark != blue)
    assert(res(2).get.head == null)
    // deterministic
    assert(f.processBatch(Seq(in("dark", png(0x101010))))
      .head.get.head == dark)
  }

  test("column naming matches the reference families") {
    assert(CaptionFilters.blip().resultSchema.fieldNames.toSeq ==
      Seq("blip_caption"))
    assert(CaptionFilters.llava("describe the scene")
      .resultSchema.fieldNames.toSeq ==
      Seq("caption llava prompt describe the scene"))
    assert(CaptionFilters.video().resultSchema.fieldNames.contains(
      "frame_blip_caption"))
  }
}
