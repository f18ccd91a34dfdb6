package graft.operators

import java.awt.image.BufferedImage

/** One shared pixel pass for every filter that scores on global
  * image statistics — [[ImageScoreFilter]], [[OnnxScoreFilter]]'s
  * feature vector, and [[CaptionFilter]]'s caption head all consume
  * the SAME raw sums, so their derived quantities cannot silently
  * diverge (the ONNX featurize doc promises equality with the
  * stand-in head's inputs; sharing the loop enforces it).
  * Raw sums only — each consumer applies its own normalization with
  * its original expressions, so refactoring changed no bit of any
  * spec-pinned score. */
private[operators] object PixelStats {

  /** n pixels; Σluma, Σluma², Σ(|r−g|+|g−b|), Σr, Σg, Σb. */
  final case class Sums(n: Double, sumL: Double, sumL2: Double,
      sumC: Double, sumR: Double, sumG: Double, sumB: Double)

  def of(img: BufferedImage): Sums = {
    val w = img.getWidth
    val h = img.getHeight
    var sumL = 0.0
    var sumL2 = 0.0
    var sumC = 0.0
    var sr = 0.0
    var sg = 0.0
    var sb = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sumL += l
        sumL2 += l * l
        sumC += math.abs(r - g) + math.abs(g - b)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    Sums((w.toLong * h).toDouble, sumL, sumL2, sumC, sr, sg, sb)
  }
}
