package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Modality

/** Farneback flow correctness: a smooth translated pattern must
  * recover the translation; identical frames must give ~zero flow;
  * and the video filter must produce a real motion score from real
  * decoded MJPEG frames.
  */
class OpticalFlowSpec extends AnyFunSuite {

  private val W = 64
  private val H = 64

  /** Smooth band-limited pattern (sums of sinusoids) — differentiable
    * everywhere, so the quadratic expansion is well-conditioned. */
  private def pattern(x: Double, y: Double): Double =
    128.0 + 50.0 * math.sin(x * 0.35) * math.cos(y * 0.28) +
      30.0 * math.sin((x + y) * 0.17) + 20.0 * math.cos(x * 0.11 - y * 0.23)

  private def frame(dx: Double, dy: Double): Array[Double] =
    Array.tabulate(W * H)(i => pattern(i % W - dx, i / W - dy))

  /** mean flow over the interior (border expansion is clamped) */
  private def interiorMean(u: Array[Double], v: Array[Double])
      : (Double, Double) = {
    var su = 0.0
    var sv = 0.0
    var n = 0
    for (y <- 16 until H - 16; x <- 16 until W - 16) {
      su += u(y * W + x); sv += v(y * W + x); n += 1
    }
    (su / n, sv / n)
  }

  test("recovers a pure translation within a quarter pixel") {
    val f1 = frame(0, 0)
    val f2 = frame(2.0, 1.0) // content moves +2 in x, +1 in y
    val (u, v) = Farneback.flow(f1, f2, W, H)
    val (mu, mv) = interiorMean(u, v)
    assert(math.abs(mu - 2.0) < 0.25, s"u mean $mu, want ~2.0")
    assert(math.abs(mv - 1.0) < 0.25, s"v mean $mv, want ~1.0")
  }

  test("identical frames yield near-zero flow") {
    val f = frame(0, 0)
    val (u, v) = Farneback.flow(f, f, W, H)
    val (mu, mv) = interiorMean(u, v)
    assert(math.abs(mu) < 0.01 && math.abs(mv) < 0.01, s"($mu, $mv)")
  }

  test("sub-pixel translation resolves with the right sign and scale") {
    val (u, v) = Farneback.flow(frame(0, 0), frame(0.5, -0.5), W, H)
    val (mu, mv) = interiorMean(u, v)
    assert(mu > 0.25 && mu < 0.75, s"u mean $mu, want ~0.5")
    assert(mv < -0.25 && mv > -0.75, s"v mean $mv, want ~-0.5")
  }

  test("pyramid recovers large motion the single scale cannot") {
    val W2 = 96
    val H2 = 96
    def frame2(dx: Double): Array[Double] =
      Array.tabulate(W2 * H2)(i => pattern(i % W2 - dx, i / W2))
    def mean(u: Array[Double], v: Array[Double]): (Double, Double) = {
      var su = 0.0; var sv = 0.0; var n = 0
      for (y <- 24 until H2 - 24; x <- 24 until W2 - 24) {
        su += u(y * W2 + x); sv += v(y * W2 + x); n += 1
      }
      (su / n, sv / n)
    }
    val (f1, f2) = (frame2(0), frame2(8.0)) // 8 px — past the 5 px window
    val (su, _) = { val (u, v) = Farneback.flow(f1, f2, W2, H2); mean(u, v) }
    val (pu, pv) = {
      val (u, v) = Farneback.flowPyramid(f1, f2, W2, H2); mean(u, v)
    }
    assert(math.abs(pu - 8.0) < 0.75, s"pyramid u mean $pu, want ~8")
    assert(math.abs(pv) < 0.5, s"pyramid v mean $pv, want ~0")
    assert(math.abs(pu - 8.0) < math.abs(su - 8.0),
      s"pyramid ($pu) must beat single-scale ($su) on large motion")
  }

  // --- end-to-end: MJPEG AVI → frames → flow score ---

  private def jpegOf(shift: Int): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until H; x <- 0 until W) {
      val l = math.min(255, math.max(0, pattern(x - shift, y).toInt))
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w32(vv: Long): Unit = {
      bos.write((vv & 0xff).toInt); bos.write(((vv >> 8) & 0xff).toInt)
      bos.write(((vv >> 16) & 0xff).toInt); bos.write(((vv >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(0); tag("AVI ")
    val moviSize = 4 + frames.map(f => 8L + f.length + (f.length & 1)).sum
    tag("LIST"); w32(moviSize); tag("movi")
    frames.foreach { f =>
      tag("00dc"); w32(f.length.toLong); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  test("FarnebackFilter: moving video scores higher than a static one") {
    val f = FarnebackFilter(nFrames = 3)
    val moving = mjpegAvi(Seq(jpegOf(0), jpegOf(3), jpegOf(6)))
    val static = mjpegAvi(Seq(jpegOf(0), jpegOf(0), jpegOf(0)))
    val res = f.processBatch(Seq(
      FilterInput("m", Map(Modality.Video.name -> moving), Map.empty),
      FilterInput("s", Map(Modality.Video.name -> static), Map.empty),
      FilterInput("junk", Map(Modality.Video.name -> Array[Byte](1)),
        Map.empty)))
    val Seq(m, s, bad) = res.map(_.get)
    assert(m(0) == true && s(0) == true && bad(0) == false)
    val mFlow = m(1).asInstanceOf[Double]
    val sFlow = s(1).asInstanceOf[Double]
    assert(mFlow > 1.0, s"moving video mean flow $mFlow should be ~3")
    assert(sFlow < 0.5, s"static video mean flow $sFlow should be ~0")
    assert(mFlow > 3 * sFlow)
  }
}
