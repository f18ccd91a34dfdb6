package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.types._
import graft.core.Modality

/** Deterministic AUDIO fingerprinting — the audio member of the
  * multimodal dedup family ([[PHashFilter]] is the image one; the
  * reference's audio surface stops at info_filter.py, so this is an
  * extension in the Haitsma–Kalker / Chromaprint tradition):
  *
  *  1. decode WAV PCM (javax.sound, 8/16-bit, any channel count),
  *     downmix to mono;
  *  2. frame into [[AudioFingerprint.FrameSize]]-sample windows every
  *     [[AudioFingerprint.Hop]] samples; per frame, an FFT energy
  *     spectrum collapsed onto [[AudioFingerprint.NumBands]]+1
  *     log-spaced bands in the 300–3000 Hz speech/music core;
  *  3. per frame, a [[AudioFingerprint.NumBands]]-bit sub-fingerprint:
  *     bit m = sign of the band-energy difference derivative
  *     (E(n,m)−E(n,m+1)) − (E(n−1,m)−E(n−1,m+1)) — the
  *     Haitsma–Kalker bit. Uniform gain scales every energy by the
  *     same factor, so a SIGNAL-dominated bit never flips under
  *     gain riding; bits of empty bands (degenerate narrowband
  *     content) ride the quantization-noise floor and may — real
  *     audio is broadband, and the spec pins gain-riding hamming
  *     within the banding budget on band-loaded content;
  *  4. the clip-level hash: a 63-bit SimHash over the BAG of
  *     splitmix64-mixed frame prints — order-insensitive, so small
  *     time shifts leave most bits intact — emitted as a 16-hex
  *     string compatible with [[ImageDedup.nearDupPairs]]'s banded
  *     hamming pipeline (band → candidate → popcount verify). Audio
  *     near-dup dedup is therefore `AudioFingerprintFilter` + the
  *     EXISTING ImageDedup machinery on the fingerprint column.
  *
  * Bit-exactness vs any external fingerprinter is explicitly not the
  * contract (the PHashFilter rule): parity is same-input ⇒ same-hash
  * within this engine, scale-invariance by construction, and SMALL
  * hamming for perceptually-near clips — which is what dedup
  * consumes.
  */
object AudioFingerprint {

  val FrameSize = 1024
  val Hop = 512
  val NumBands = 16
  val FpBits = 63
  val BandLoHz = 300.0
  val BandHiHz = 3000.0

  /** Decode + fingerprint: Some((hex64, nFrames)) or None when the
    * payload is undecodable / not PCM / too short for two frames. */
  def fingerprint(wavBytes: Array[Byte]): Option[(String, Long)] =
    try {
      decodeMono(wavBytes).flatMap { case (pcm, rate) =>
        val prints = framePrints(pcm, rate)
        if (prints.isEmpty) None
        else Some((f"${simhashOfPrints(prints)}%016x", prints.length.toLong))
      }
    } catch { case _: Exception => None }

  /** PCM decode + channel-average downmix, normalized to [-1, 1]. */
  private[operators] def decodeMono(
      bytes: Array[Byte]): Option[(Array[Double], Double)] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val bits = fmt.getSampleSizeInBits
    val enc = fmt.getEncoding
    val signed = enc == AudioFormat.Encoding.PCM_SIGNED
    if (!(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED)) return None
    if (bits != 8 && bits != 16) return None
    val data = ais.readAllBytes()
    val bytesPer = bits / 8
    val ch = math.max(fmt.getChannels, 1)
    val nFrames = data.length / (bytesPer * ch)
    if (nFrames == 0) return None
    val out = new Array[Double](nFrames)
    var i = 0
    while (i < nFrames) {
      var sum = 0.0
      var c = 0
      while (c < ch) {
        val idx = (i * ch + c) * bytesPer
        val s: Int =
          if (bits == 16) {
            val raw =
              if (fmt.isBigEndian)
                (data(idx).toInt << 8) | (data(idx + 1) & 0xff)
              else
                (data(idx + 1).toInt << 8) | (data(idx) & 0xff)
            if (signed) raw else (raw & 0xffff) - 32768
          } else {
            if (signed) data(idx).toInt else (data(idx) & 0xff) - 128
          }
        sum += s.toDouble / (if (bits == 16) 32768.0 else 128.0)
        c += 1
      }
      out(i) = sum / ch
      i += 1
    }
    Some((out, fmt.getSampleRate.toDouble))
  }

  /** Per-frame [[NumBands]]-bit Haitsma–Kalker sub-fingerprints. */
  private[operators] def framePrints(pcm: Array[Double],
      rate: Double): Array[Int] = {
    if (pcm.length < FrameSize + Hop) return Array.empty
    // log-spaced band edges in Hz → FFT bin indices (clamped sane)
    val edges = Array.tabulate(NumBands + 2) { b =>
      val f = BandLoHz * math.pow(BandHiHz / BandLoHz,
        b.toDouble / (NumBands + 1))
      math.min(math.max((f * FrameSize / rate).toInt, 1), FrameSize / 2 - 1)
    }
    val nFrames = (pcm.length - FrameSize) / Hop + 1
    val energies = Array.ofDim[Double](nFrames, NumBands + 1)
    val re = new Array[Double](FrameSize)
    val im = new Array[Double](FrameSize)
    // Hann window keeps band energies from smearing across edges;
    // coefficients are frame-invariant — computed once per clip, not
    // one cos() per sample per frame (bit-identical product below)
    val win = Array.tabulate(FrameSize)(i =>
      0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1))))
    var n = 0
    while (n < nFrames) {
      var i = 0
      while (i < FrameSize) {
        re(i) = pcm(n * Hop + i) * win(i)
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      var b = 0
      while (b < NumBands + 1) {
        var e = 0.0
        var k = edges(b)
        // a degenerate band (equal clamped edges) keeps ≥1 bin so the
        // difference chain stays defined
        val hi = math.max(edges(b + 1), edges(b) + 1)
        while (k < hi) {
          e += re(k) * re(k) + im(k) * im(k)
          k += 1
        }
        energies(n)(b) = e
        b += 1
      }
      n += 1
    }
    // HK bit: sign of the time-derivative of band-energy differences;
    // frames 1..nFrames-1 emit prints
    Array.tabulate(nFrames - 1) { f =>
      var print0 = 0
      var m = 0
      while (m < NumBands) {
        val d = (energies(f + 1)(m) - energies(f + 1)(m + 1)) -
          (energies(f)(m) - energies(f)(m + 1))
        if (d > 0) print0 |= (1 << m)
        m += 1
      }
      print0
    }
  }

  /** In-place radix-2 Cooley–Tukey FFT (FrameSize is a power of 2). */
  private[operators] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT size must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(s + k); val ui = im(s + k)
          val vr = re(s + k + len / 2) * cr - im(s + k + len / 2) * ci
          val vi = re(s + k + len / 2) * ci + im(s + k + len / 2) * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + len / 2) = ur - vr; im(s + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** splitmix64 — the well-mixed deterministic feature hash (the
    * biased quadratic-seed lesson from the ONNX fixtures applies to
    * production hashes too). */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 63-bit SimHash over the bag of frame prints (order-insensitive;
    * majority vote per bit, ties → 0 — the TextFunctions.simhash
    * convention). */
  private[operators] def simhashOfPrints(prints: Array[Int]): Long = {
    val counts = new Array[Int](FpBits)
    prints.foreach { p =>
      val h = splitmix64(p.toLong)
      var b = 0
      while (b < FpBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < FpBits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** [[AudioFingerprint]] as a batch [[DataFilter]]: emits the 16-hex
  * clip fingerprint + frame count; undecodable audio yields nulls
  * (reference null discipline). Compose with
  * [[ImageDedup.nearDupPairs]] / [[ImageDedup.survivors]] on the
  * fingerprint column for banded audio near-dup dedup. */
final case class AudioFingerprintFilter(override val batchSize: Int = 64)
    extends DataFilter {
  override val modalities = Seq(Modality.Audio)
  override val resultSchema = StructType(Seq(
    StructField("audio_fingerprint", StringType),
    StructField("n_fingerprint_frames", LongType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Audio.name) match {
        case None => Some(Seq(null, null))
        case Some(bytes) =>
          AudioFingerprint.fingerprint(bytes) match {
            case Some((hex, n)) => Some(Seq(hex, Long.box(n)))
            case None => Some(Seq(null, null))
          }
      }
    }
}
