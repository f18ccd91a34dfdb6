package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.SparkSpec

/** The [[SyntheticImages]] ↔ pHash contract q_phash_dedup's oracle
  * stands on: equal seeds give byte-equal pixels (hash-equal), the
  * retouch sits within hamming 1 of its base, and unrelated seeds sit
  * far apart (no accidental near-dup pairs). */
class SyntheticImagesSpec extends SparkSpec {

  private val ph = PHashFilter(8)

  private def hashOf(seed: Long, retouch: Boolean = false): Long = {
    val img = ImageIO.read(
      new ByteArrayInputStream(SyntheticImages.renderPng(seed, retouch)))
    java.lang.Long.parseUnsignedLong(ph.phashHex(img), 16)
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("equal seeds collide; retouch is hamming <= 1; strangers are far") {
    val seeds = (0 until 40).map(i => SyntheticImages.seedOf(s"text $i"))
    val hs = seeds.map(hashOf(_))
    // determinism / byte-equality of equal seeds
    assert(hashOf(seeds.head) == hs.head)
    // retouch: pHash-near, byte-different pixels
    seeds.take(10).foreach { s =>
      val d = hamming(hashOf(s), hashOf(s, retouch = true))
      assert(d <= 1, s"retouch drifted $d bits for seed $s")
      assert(SyntheticImages.render(s, false).getRGB(0, 0) !=
        SyntheticImages.render(s, true).getRGB(0, 0))
    }
    // unrelated pairs: far outside the hamming-3 dedup radius
    val pairs = for {
      i <- hs.indices; j <- hs.indices if i < j
    } yield hamming(hs(i), hs(j))
    assert(pairs.min > ImageDedup.MaxHamming * 3,
      s"closest stranger pair at ${pairs.min} bits")
  }
}
