package graft.operators

import graft.SparkSpec

/** [[SyntheticAudio]]: the fixture must make the audio-dedup oracle
  * SYMBOLIC — identical seeds give byte-equal WAVs, a gain-rided
  * variant stays inside the banded pipeline's guaranteed-recall
  * hamming budget, and unrelated seeds sit far enough that no false
  * pair can form across a corpus-sized slice (the q_phash_dedup
  * proof obligations, audio edition). */
class SyntheticAudioSpec extends SparkSpec {

  private def fpOf(bytes: Array[Byte]): String =
    AudioFingerprint.fingerprint(bytes).get._1

  private def hamming(a: String, b: String): Int =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))

  test("byte-determinism, gain-pair closeness, unrelated separation " +
      "across 300 seeds") {
    val n = 300
    val fps = (0 until n).map { i =>
      val s = SyntheticAudio.seedOf(s"doc text $i payload ${i * 31}")
      // byte-equal renders (the exact-duplicate-text collapse)
      val w1 = SyntheticAudio.renderWav(s, gainRide = false)
      val w2 = SyntheticAudio.renderWav(s, gainRide = false)
      assert(java.util.Arrays.equals(w1, w2))
      (fpOf(w1), fpOf(SyntheticAudio.renderWav(s, gainRide = true)))
    }
    // every gain pair within the 4×16-band pigeonhole guarantee
    val gains = fps.map { case (b, g) => hamming(b, g) }
    info(s"gain-pair hamming: max=${gains.max} " +
      f"mean=${gains.sum.toDouble / n}%.2f")
    assert(gains.max <= ImageDedup.MaxHamming,
      s"a gain pair flipped ${gains.max} bits — outside guaranteed recall")
    // no unrelated pair anywhere near the verify threshold
    var minU = 64
    for (i <- 0 until n; j <- (i + 1) until n) {
      val h = hamming(fps(i)._1, fps(j)._1)
      if (h < minU) minU = h
    }
    info(s"unrelated floor across ${n * (n - 1) / 2} pairs: $minU")
    assert(minU > ImageDedup.MaxHamming * 3,
      s"unrelated fingerprints only $minU bits apart — oracle unsafe")
  }
}
