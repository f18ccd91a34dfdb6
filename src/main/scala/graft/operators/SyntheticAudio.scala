package graft.operators

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic WAV test fixtures for the AUDIO media path — the
  * audio twin of [[SyntheticImages]] (round-8 item: complete the
  * multimodal oracle triple). The clip is a PURE FUNCTION of a seed
  * (derived from a document's text), so exact-duplicate texts yield
  * byte-equal WAVs, and a `gainRide` variant scales the amplitude
  * uniformly — byte-different audio whose [[AudioFingerprint]] must
  * stay within the banded pipeline's hamming budget.
  *
  * The signal is designed so every fingerprint bit is STRUCTURAL —
  * determined by seed bits through sign arithmetic, never by a
  * statistical vote that quantization could tip:
  *
  *  - one tone per fingerprint band (band-LOADED content, the
  *    [[AudioFingerprint]] broadband requirement), base power
  *    strictly decreasing in the band index;
  *  - the clip splits into THREE phases (18/46, 15/46, 13/46 of the
  *    duration). Within a phase every band's amplitude ramps
  *    linearly from 1 to 1 ± 0.3, the SIGN drawn from the seed per
  *    (phase, band). Since all ramps share the same magnitude and
  *    start point, the Haitsma–Kalker bit m — the sign of
  *    d/dn[E_m − E_{m+1}] — reduces to the seed's sign bit s(p, m)
  *    with a margin bounded away from zero for every adjacent pair
  *    (equal signs leave the strictly-decreasing base-power gap;
  *    opposite signs add magnitudes). Each phase therefore
  *    contributes ONE constant 16-bit frame print = its sign
  *    vector;
  *  - the clip SimHash majority-votes the three splitmix-mixed phase
  *    prints with frame weights ≈ 18/15/13 — every combination of
  *    three signs has |±18 ± 15 ± 13| ≥ 10, so no clip bit rides a
  *    thin vote (phase-boundary frames contribute at most ±2).
  *    Unrelated seeds draw independent 48-bit print triples, so
  *    their 63-bit SimHashes sit near the binomial center (~31 bits
  *    apart — [[SyntheticAudioSpec]] measures the floor), while a
  *    gain ride scales every band energy by one factor and flips
  *    nothing.
  */
object SyntheticAudio {

  /** splitmix64 — the standard 64-bit finalizer-based PRNG step. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def seedOf(text: String): Long =
    text.getBytes("UTF-8").foldLeft(0x7a0d10c5L)((a, b) => mix(a ^ b))

  val Rate = 8000.0
  val Seconds = 3.0
  private val GainRideFactor = 0.5
  private val RampDepth = 0.3
  // phase ends as fractions of the clip (frame weights 18:15:13 —
  // min |±18 ± 15 ± 13| = 10, the vote-margin floor)
  private val PhaseEnds = Array(18.0 / 46, 33.0 / 46, 1.0)

  /** The seed's ramp-sign for (phase, band): ±1. */
  private def rampSign(seed: Long, phase: Int, band: Int): Double =
    if (((mix(seed ^ (phase * 37L + band * 3L + 11L)) >>> 13) & 1L) == 1L)
      1.0 else -1.0

  /** Seed-determined 16-bit mono PCM. */
  private def pcm(seed: Long, gainRide: Boolean): Array[Short] = {
    val nb = AudioFingerprint.NumBands + 1
    // one slightly-off-center tone per fingerprint band
    val freqs = Array.tabulate(nb)(b =>
      1.02 * AudioFingerprint.BandLoHz * math.pow(
        AudioFingerprint.BandHiHz / AudioFingerprint.BandLoHz,
        b.toDouble / nb))
    val amp = (if (gainRide) GainRideFactor else 1.0) * 9000.0
    val n = (Seconds * Rate).toInt
    // rampSign depends only on (phase, band) — hoist the splitmix
    // draw out of the sample loop (it was one mix() per sample per
    // band, ~60% of the render's non-sin arithmetic); bit-identical
    // output, the doubles multiply in the same order below
    val signs = Array.tabulate(PhaseEnds.length, nb)(
      (p, b) => rampSign(seed, p, b))
    Array.tabulate(n) { i =>
      val t = i / Rate
      val frac = t / Seconds
      val p = PhaseEnds.indexWhere(frac < _) match {
        case -1 => PhaseEnds.length - 1
        case x => x
      }
      val pStart = if (p == 0) 0.0 else PhaseEnds(p - 1)
      val inPhase = (frac - pStart) / (PhaseEnds(p) - pStart)
      var s = 0.0
      var b = 0
      while (b < nb) {
        val ramp = 1.0 + RampDepth * signs(p)(b) * inPhase
        s += ramp * math.sin(2 * math.Pi * freqs(b) * t) / (b + 2)
        b += 1
      }
      (amp * s).toShort
    }
  }

  /** Render the seed's clip as a WAV byte array (16-bit PCM mono,
    * little-endian — the [[AudioFingerprint]] decode path). */
  def renderWav(seed: Long, gainRide: Boolean): Array[Byte] = {
    val samples = pcm(seed, gainRide)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(Rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
