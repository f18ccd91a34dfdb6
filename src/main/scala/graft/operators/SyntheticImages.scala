package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic PNG synthesis for the media-path round-trip queries:
  * a 64×64 block-texture image fully determined by a 64-bit seed, so
  * equal seeds yield byte-equal pixels (and therefore equal pHashes)
  * on any executor, plus the contrast/brightness retouch whose pHash
  * distance from the base image is provably ≤ 1 bit.
  *
  * Texture: 8×8-pixel blocks, each channel an independent splitmix64
  * draw — pseudo-random enough that unrelated seeds produce pHashes
  * with ~32-bit expected hamming distance (no accidental near-dup
  * pairs at any realistic corpus size), structured enough that the
  * DCT low-frequency block carries real energy. Channel values are
  * EVEN, so the retouch map v → v/2 + 64 is an exact integer linear
  * transform: every AC coefficient of the 32×32 grayscale halves
  * exactly, median comparisons are invariant, and at most the DC bit
  * of the hash flips — the re-encode-style edit pHash is designed to
  * tolerate and byte-equality dedup is not.
  */
object SyntheticImages {

  /** splitmix64 — the standard 64-bit finalizer-based PRNG step. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val Size = 64
  private val Block = 8

  /** Render the seed's image; `retouch` applies the exact-linear
    * remap (see class doc). */
  def render(seed: Long, retouch: Boolean): BufferedImage = {
    val img = new BufferedImage(Size, Size, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < Size) {
      var x = 0
      while (x < Size) {
        val h = mix(mix(mix(seed) ^ (x / Block).toLong) ^
          (y / Block).toLong * 7919L)
        // even channels in [0, 254]
        def ch(shift: Int): Int = {
          val v = (((h >>> shift) & 0x7fL).toInt) * 2
          if (retouch) v / 2 + 64 else v
        }
        img.setRGB(x, y, (ch(0) << 16) | (ch(8) << 8) | ch(16))
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[render]] PNG-encoded. PNG encoding is lossless, so the decoded
    * pixels — all pHash sees — are seed-determined regardless of any
    * encoder byte-level variation. */
  def renderPng(seed: Long, retouch: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(render(seed, retouch), "png", bos)
    bos.toByteArray
  }

  /** Seed from arbitrary text: splitmix-folded UTF-8 bytes. Equal
    * text ⇒ equal seed ⇒ byte-equal image — the property the
    * phash-dedup oracle keys on. */
  def seedOf(text: String): Long =
    text.getBytes("UTF-8").foldLeft(0x51ed2701L)((a, b) => mix(a ^ b))
}
