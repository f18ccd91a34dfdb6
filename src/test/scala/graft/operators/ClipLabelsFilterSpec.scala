package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Modality

/** Zero-shot label fan-out: one deterministic score column per label
  * with the reference's column naming, templated prompt averaging,
  * and null fan-out on undecodable payloads. */
class ClipLabelsFilterSpec extends AnyFunSuite {

  private def png(rgb: Int): Array[Byte] = {
    val img = new BufferedImage(24, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 24) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("one column per label, reference naming, scores in [0,1]") {
    val f = ClipLabelsFilter(Seq("cat", "dog", "car"))
    assert(f.resultSchema.fieldNames.toSeq == Seq(
      "clip score \"cat\"", "clip score \"dog\"", "clip score \"car\""))
    val res = f.processBatch(Seq(
      FilterInput("img", Map(Modality.Image.name -> png(0x3060c0)), Map.empty),
      FilterInput("bad", Map(Modality.Image.name -> Array[Byte](1)), Map.empty)))
    val scores = res(0).get.map(_.asInstanceOf[Double])
    assert(scores.length == 3)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.distinct.length > 1, "labels must not all tie")
    assert(res(1).get.forall(_ == null))
  }

  test("deterministic and template-sensitive") {
    val f1 = ClipLabelsFilter(Seq("cat"))
    val f2 = ClipLabelsFilter(Seq("cat"), templates = Seq("an image of {label}"))
    def s(f: ClipLabelsFilter) = f.processBatch(Seq(FilterInput("k",
      Map(Modality.Image.name -> png(0x804020)), Map.empty)))
      .head.get.head.asInstanceOf[Double]
    assert(s(f1) == s(f1))
    assert(s(f1) != s(f2), "different prompt templates must change scores")
  }
}
