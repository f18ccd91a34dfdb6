package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[AudioFingerprint]]: FFT correctness against hand-computable
  * spectra, fingerprint determinism + amplitude invariance (the
  * Haitsma–Kalker bit is a sign of energy DIFFERENCES), separation of
  * unrelated content, and the composition with ImageDedup's banded
  * hamming pipeline for audio near-dup dedup.
  */
class AudioFingerprintSpec extends SparkSpec {

  private def wav16(pcm: Array[Short], rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](pcm.length * 2)
    pcm.indices.foreach { i =>
      bytes(2 * i) = (pcm(i) & 0xff).toByte
      bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, pcm.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def sine(hz: Double, seconds: Double, amp: Double,
      rate: Double = 8000.0): Array[Short] =
    Array.tabulate((seconds * rate).toInt)(i =>
      (amp * 32000 * math.sin(2 * math.Pi * hz * i / rate)).toShort)

  /** Band-loaded test content: one slightly-off-center tone per
    * fingerprint band, each with its own slow amplitude modulation —
    * every band-energy difference is SIGNAL-dominated (a stationary
    * pure tone leaves empty bands whose HK derivative bits are
    * quantization-noise coin flips; real audio, like this signal, is
    * broadband). */
  private def richSignal(seconds: Double, amp: Double,
      rate: Double = 8000.0): Array[Short] = {
    val nb = AudioFingerprint.NumBands + 1
    val freqs = Array.tabulate(nb)(b =>
      1.02 * AudioFingerprint.BandLoHz * math.pow(
        AudioFingerprint.BandHiHz / AudioFingerprint.BandLoHz,
        b.toDouble / nb))
    Array.tabulate((seconds * rate).toInt) { i =>
      val t = i / rate
      var s = 0.0
      var b = 0
      while (b < nb) {
        s += math.sin(2 * math.Pi * freqs(b) * t) / (b + 2) *
          (1.0 + 0.4 * math.sin(2 * math.Pi * (b + 1) * 1.3 * t))
        b += 1
      }
      (amp * 12000 * s).toShort
    }
  }

  /** deterministic noise-ish signal (splitmix-free LCG is fine here —
    * only used as "different content") */
  private def pseudoNoise(n: Int): Array[Short] = {
    var s = 12345L
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40).toShort)
    }
  }

  test("FFT matches the analytic spectrum of a pure tone") {
    val n = 1024
    val k0 = 64 // exact bin
    val re = Array.tabulate(n)(i => math.cos(2 * math.Pi * k0 * i / n))
    val im = new Array[Double](n)
    AudioFingerprint.fft(re, im)
    // energy concentrates at bins k0 and n-k0 (each n/2), ~zero rest
    assert(math.abs(re(k0) - n / 2.0) < 1e-6, re(k0))
    assert(math.abs(re(n - k0) - n / 2.0) < 1e-6)
    (0 until n).filterNot(k => k == k0 || k == n - k0).foreach { k =>
      assert(math.hypot(re(k), im(k)) < 1e-6, s"bin $k leaked")
    }
    // Parseval on a ramp: sum|X|^2 == n * sum|x|^2
    val r2 = Array.tabulate(n)(i => (i % 17) / 17.0 - 0.5)
    val i2 = new Array[Double](n)
    val time = r2.map(v => v * v).sum
    AudioFingerprint.fft(r2, i2)
    val freq = r2.indices.map(k => r2(k) * r2(k) + i2(k) * i2(k)).sum
    assert(math.abs(freq - n * time) / (n * time) < 1e-9)
  }

  private def fpOf(bytes: Array[Byte]): String =
    AudioFingerprint.fingerprint(bytes).get._1

  private def hamming(a: String, b: String): Int =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))

  test("deterministic, gain-robust, content-separating") {
    val master = wav16(richSignal(2.0, 0.9))
    val quiet = wav16(richSignal(2.0, 0.3))
    val noise = wav16(pseudoNoise(16000))
    // same bytes → same fingerprint
    assert(fpOf(master) == fpOf(master))
    // uniform gain preserves the sign of every signal-dominated HK
    // difference; only WAV quantization noise can flip a bit — must
    // stay within the banding pipeline's hamming budget
    val gainHam = hamming(fpOf(master), fpOf(quiet))
    assert(gainHam <= ImageDedup.MaxHamming,
      s"gain-riding flipped $gainHam bits: " +
        s"${fpOf(master)} vs ${fpOf(quiet)}")
    // unrelated content is far in hamming
    assert(hamming(fpOf(master), fpOf(noise)) >= 10,
      s"signal vs noise hamming ${hamming(fpOf(master), fpOf(noise))}")
    // too-short audio is honestly null, not a garbage hash
    assert(AudioFingerprint.fingerprint(
      wav16(sine(440, 0.05, 0.8))).isEmpty)
  }

  test("composes with ImageDedup banding: gain-riding twin found, " +
      "unrelated clip not") {
    val rows = Seq(
      (1L, fpOf(wav16(richSignal(2.0, 0.9)))),
      (2L, fpOf(wav16(richSignal(2.0, 0.5)))), // the same master, gain-rid
      (3L, fpOf(wav16(pseudoNoise(16000)))))
    import spark.implicits._
    val df = rows.toDF("clip_id", "audio_fingerprint")
    val pairs = ImageDedup.nearDupPairs(df, "clip_id", "audio_fingerprint")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), pairs.toSeq)
    val surv = ImageDedup.survivors(df, "clip_id", "audio_fingerprint")
      .collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(1L, 3L))
  }

  test("filter contract: fingerprint column + null discipline") {
    val good = AudioFingerprintFilter().processBatch(Seq(
      graft.operators.FilterInput("k",
        Map("audio" -> wav16(sine(300, 1.0, 0.7))), Map.empty))).head.get
    assert(good(0).asInstanceOf[String].matches("[0-9a-f]{16}"))
    assert(good(1).asInstanceOf[Long] > 10L)
    val bad = AudioFingerprintFilter().processBatch(Seq(
      graft.operators.FilterInput("k",
        Map("audio" -> Array[Byte](1, 2, 3)), Map.empty))).head.get
    assert(bad(0) == null && bad(1) == null)
    val missing = AudioFingerprintFilter().processBatch(Seq(
      graft.operators.FilterInput("k", Map.empty, Map.empty))).head.get
    assert(missing(0) == null)
  }
}
