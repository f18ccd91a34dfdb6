package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}
import org.apache.spark.sql.types._
import graft.core.Modality

/** Image structural probe: decode + dimensions, null columns and an
  * error string on failure — the contract of the reference's
  * ImageInfoFilter (DPF/filters/images/info_filter.py:22-72), decoded
  * with javax.imageio instead of PIL. */
final case class ImageInfoFilter(override val batchSize: Int = 64)
    extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(false, null, null, null, "payload missing"))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null)
              Some(Seq(false, null, null, null, "undecodable image"))
            else
              Some(Seq(true, img.getWidth, img.getHeight,
                img.getColorModel.getNumComponents, null))
          } catch {
            case e: Exception =>
              Some(Seq(false, null, null, null, e.toString))
          }
      }
    }
}

/** 64-bit DCT perceptual hash (pHash) as a hex string column
  * `image_phash_{n}` — same algorithm family as the reference
  * (DPF/filters/images/hash_filters.py:13-28: resize 32×32 → 2-D
  * DCT → top-left n×n → median threshold → hex).
  *
  * Bit-exactness vs scipy/PIL is explicitly NOT the contract
  * (SURVEY.md §7.4 risk 1): parity is same-input⇒same-hash within
  * this engine and hash-equality for duplicate images, which is what
  * dedup consumes. Pure JVM: area-average resample + own DCT-II.
  */
final case class PHashFilter(hashSize: Int = 8,
    override val batchSize: Int = 64) extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override def name = s"PHashFilter($hashSize)"
  override val resultSchema = StructType(Seq(
    StructField(s"image_phash_$hashSize", StringType)))

  import PHashFilter.{DctSize, dctCos}

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(null))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(null))
            else Some(Seq(phashHex(img)))
          } catch { case _: Exception => Some(Seq(null)) }
      }
    }

  /** grayscale 32×32 area-average → DCT-II → hashSize×hashSize
    * low-frequency block → median threshold → hex. */
  private[operators] def phashHex(img: BufferedImage): String = {
    val gray = toGray32(img)
    val dct = dct2d(gray)
    val block = for {
      y <- 0 until hashSize
      x <- 0 until hashSize
    } yield dct(y)(x)
    // median over the block excluding the DC term, like the common
    // pHash formulation (robust to global brightness)
    val vals = block.drop(1)
    val sorted = vals.sorted
    val median = sorted(sorted.length / 2)
    val bits = block.map(v => if (v > median) 1 else 0)
    bits.grouped(4).map(g =>
      Integer.toHexString(g.foldLeft(0)((a, b) => (a << 1) | b))).mkString
  }

  private def toGray32(img: BufferedImage): Array[Array[Double]] = {
    val out = Array.ofDim[Double](DctSize, DctSize)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < DctSize) {
      var x = 0
      while (x < DctSize) {
        // area-average the source cell mapped to this target pixel
        val x0 = x * w / DctSize
        val x1 = math.max((x + 1) * w / DctSize, x0 + 1)
        val y0 = y * h / DctSize
        val y1 = math.max((y + 1) * h / DctSize, y0 + 1)
        var sum = 0.0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = img.getRGB(xx, yy)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += 0.299 * r + 0.587 * g + 0.114 * b
            xx += 1
          }
          yy += 1
        }
        out(y)(x) = sum / ((x1 - x0) * (y1 - y0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Separable DCT-II with orthonormal scaling. */
  private def dct2d(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = DctSize
    val cos = dctCos
    def scale(k: Int) = if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
    val rows = Array.tabulate(n, n) { (y, k) =>
      var s = 0.0
      var i = 0
      while (i < n) { s += m(y)(i) * cos(k)(i); i += 1 }
      scale(k) * s
    }
    Array.tabulate(n, n) { (k, x) =>
      var s = 0.0
      var i = 0
      while (i < n) { s += rows(i)(x) * cos(k)(i); i += 1 }
      scale(k) * s
    }
  }
}

object PHashFilter {
  private[operators] val DctSize = 32

  /** DCT basis table — fixed by [[DctSize]], shared across every
    * image. Lives on the COMPANION so it is built once per JVM: as
    * an instance lazy val on the case class it was rebuilt once per
    * deserialized task instance (1024 cos() per task — harmless, but
    * free to fix). */
  private[operators] lazy val dctCos = Array.tabulate(DctSize, DctSize)(
    (k, i) => math.cos(math.Pi * k * (2 * i + 1) / (2.0 * DctSize)))
}

/** Model-backed image scoring — the contract of the reference's
  * aesthetic / NSFW filter family (DPF/filters/images/
  * aesthetic_improved_filter.py:71-110, nsfw_filter.py:45-90:
  * decode → featurize → linear head → score column, batched), with a
  * DETERMINISTIC stand-in for the network so the operator is testable
  * without model weights: pixel statistics (mean luminance, contrast,
  * colorfulness, log-resolution) through a fixed linear head and the
  * algebraic squash s(z) = 0.5·(1 + z/(1+|z|)) — the same
  * featurize→head→squash shape as `TextFunctions.modelScoreRaw`, and
  * exact IEEE arithmetic end to end (no libm exp). Production swaps
  * an ONNX session behind this same `DataFilter` trait; the batching,
  * null-on-undecodable semantics, and 1:1 merge are what this class
  * pins. */
final case class ImageScoreFilter(override val batchSize: Int = 64)
    extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override val resultSchema = StructType(Seq(
    StructField("image_score", DoubleType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(null))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(null))
            else Some(Seq(score(img)))
          } catch { case _: Exception => Some(Seq(null)) }
      }
    }

  /** One pass over the pixels ([[PixelStats]]): E[luma], E[luma²]
    * (contrast via the variance), mean |r−g| + |g−b| (colorfulness
    * proxy). */
  private[operators] def score(img: BufferedImage): Double = {
    val s = PixelStats.of(img)
    val n = s.n
    val meanL = s.sumL / n / 255.0
    val contrast = math.sqrt(math.max(
      s.sumL2 / n - (s.sumL / n) * (s.sumL / n), 0.0)) / 255.0
    val color = s.sumC / n / 510.0
    val logRes = math.log1p(n) / 20.0
    val z = -1.0 + 1.5 * meanL + 4.0 * contrast + 2.0 * color + 1.0 * logRes
    (1.0 + z / (1.0 + math.abs(z))) * 0.5
  }
}

/** Audio structural probe via javax.sound (WAV/AIFF/AU in a stock
  * JVM) — contract of the reference's AudioInfoFilter
  * (DPF/filters/audios/info_filter.py:21-43): duration = frames /
  * sample_rate. */
final case class AudioInfoFilter(override val batchSize: Int = 64)
    extends DataFilter {
  override val modalities = Seq(Modality.Audio)
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("duration", DoubleType),
    StructField("sample_rate", IntegerType),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Audio.name) match {
        case None => Some(Seq(false, null, null, "payload missing"))
        case Some(bytes) =>
          try {
            val ais = AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val rate = fmt.getSampleRate
            val duration =
              if (frames >= 0 && rate > 0) frames.toDouble / rate else null
            Some(Seq(true, duration, rate.toInt, null))
          } catch {
            case e: Exception => Some(Seq(false, null, null, e.toString))
          }
      }
    }
}

/** Audio SIGNAL statistics over decoded PCM — the curation tier
  * above [[AudioInfoFilter]]'s structural probe (no reference
  * analog; its audio surface stops at info_filter.py): RMS level,
  * peak amplitude, and clipped-sample fraction, the three signals a
  * corpus pass uses to drop silent, dead-air, or hard-clipped clips.
  * Pure JVM: javax.sound decodes WAV PCM (8/16-bit, any channel
  * count); samples normalize to [-1, 1]; clipping = |sample| at the
  * integer rails. Undecodable audio yields nulls, reference null
  * discipline. */
final case class AudioStatsFilter(clipThreshold: Double = 0.999,
    override val batchSize: Int = 64) extends DataFilter {
  override val modalities = Seq(Modality.Audio)
  override val resultSchema = StructType(Seq(
    StructField("rms", DoubleType),
    StructField("peak", DoubleType),
    StructField("clip_fraction", DoubleType),
    StructField("n_samples", LongType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Audio.name) match {
        case None => Some(Seq(null, null, null, null))
        case Some(bytes) =>
          try {
            val ais = AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val bits = fmt.getSampleSizeInBits
            val enc = fmt.getEncoding
            val signed = enc == AudioFormat.Encoding.PCM_SIGNED
            require(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED,
              s"only PCM handled, got $enc")
            require(bits == 8 || bits == 16,
              s"only 8/16-bit PCM handled, got $bits")
            val data = ais.readAllBytes()
            val bytesPer = bits / 8
            val n = data.length / bytesPer
            // integer rails of the sample domain: clipping detection
            // must work at the RAW extremes (255 for unsigned 8-bit
            // normalizes to only 127/128 ≈ 0.992, under any sane
            // threshold), so a rail hit always counts as clipped
            val railLo = if (bits == 16) -32768 else -128
            val railHi = if (bits == 16) 32767 else 127
            var sumSq = 0.0
            var peak = 0.0
            var clipped = 0L
            var i = 0
            while (i < n) {
              // centered integer sample, per width/endianness/sign
              val s: Int =
                if (bits == 16) {
                  val raw =
                    if (fmt.isBigEndian)
                      (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
                    else
                      (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
                  if (signed) raw else (raw & 0xffff) - 32768
                } else {
                  if (signed) data(i).toInt else (data(i) & 0xff) - 128
                }
              val v = s.toDouble / (if (bits == 16) 32768.0 else 128.0)
              val a = math.abs(v)
              sumSq += v * v
              if (a > peak) peak = a
              if (s <= railLo || s >= railHi || a >= clipThreshold)
                clipped += 1
              i += 1
            }
            if (n == 0) Some(Seq(null, null, null, null))
            else Some(Seq(
              Double.box(math.sqrt(sumSq / n)),
              Double.box(peak),
              Double.box(clipped.toDouble / n),
              Long.box(n.toLong)))
          } catch {
            case _: Exception => Some(Seq(null, null, null, null))
          }
      }
    }
}

/** Video structural probe — contract of the reference's
  * VideoInfoFilter (DPF/filters/videos/info_filter.py:22-45:
  * is_correct, error, width, height, fps, duration).
  *
  * A stock JVM has no video codecs (and this container has no
  * ffmpeg), so only the uncompressed RIFF/AVI header path is real:
  * width/height from `avih`, fps from the video `strh` rate/scale,
  * duration = totalFrames/fps. Anything non-AVI is reported as
  * undecodable — the Spark-side plumbing (schema, batching, null
  * semantics) is the tested contract; production swaps in an
  * ffprobe/JNI decoder behind the same trait.
  */
final case class VideoInfoFilter(override val batchSize: Int = 64)
    extends DataFilter {
  override val modalities = Seq(Modality.Video)
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fps", DoubleType),
    StructField("duration", DoubleType),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Video.name) match {
        case None => Some(Seq(false, null, null, null, null, "payload missing"))
        case Some(bytes) =>
          if (bytes.length >= 12 && fourcc(bytes, 4) == "ftyp")
            Some(probeMp4(bytes))
          else Some(probeAvi(bytes))
      }
    }

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** Per-trak accumulator for the MP4 box walk. */
  private final class Trak {
    var w: Int = -1
    var h: Int = -1
    var video = false
    var timescale: Long = -1
    var dur: Long = -1
    var samples: Long = -1
  }

  /** Minimal ISO-BMFF (MP4/MOV) box walk — pure byte parsing, no
    * codec needed for STRUCTURAL info (the reference gets the same
    * fields from ffprobe): width/height from the first video trak's
    * `tkhd` (16.16 fixed), duration from `mvhd`
    * (duration/timescale), fps from the video trak's `stts` sample
    * count over its `mdhd` media duration. Handles version-0 and
    * version-1 headers and 64-bit box sizes. */
  private[graft] def probeMp4(b: Array[Byte]): Seq[Any] = {
    try {
      var movTimescale = -1L
      var movDuration = -1L
      var best: Trak = null
      def walk(start: Int, end: Int, trak: Trak): Unit = {
        var o = start
        var continue = true
        while (continue && o + 8 <= end) {
          var size = be32(b, o)
          val typ = fourcc(b, o + 4)
          var body = o + 8
          if (size == 1 && o + 16 <= end) {
            size = be64(b, o + 8); body = o + 16
          } else if (size == 0) size = end - o
          if (size < 8 || o + size > end) continue = false
          else {
            val bEnd = (o + size).toInt
            typ match {
              case "moov" | "mdia" | "minf" | "stbl" =>
                walk(body, bEnd, trak)
              case "trak" =>
                val t = new Trak
                walk(body, bEnd, t)
                if (t.video && best == null) best = t
              case "mvhd" if body + 24 <= bEnd =>
                if ((b(body) & 0xff) == 1) {
                  movTimescale = be32(b, body + 20)
                  movDuration = be64(b, body + 24)
                } else {
                  movTimescale = be32(b, body + 12)
                  movDuration = be32(b, body + 16)
                }
              case "tkhd" if trak != null =>
                val off = if ((b(body) & 0xff) == 1) 88 else 76
                if (body + off + 8 <= bEnd) {
                  trak.w = (be32(b, body + off) >> 16).toInt
                  trak.h = (be32(b, body + off + 4) >> 16).toInt
                }
              case "mdhd" if trak != null && body + 24 <= bEnd =>
                if ((b(body) & 0xff) == 1) {
                  trak.timescale = be32(b, body + 20)
                  trak.dur = be64(b, body + 24)
                } else {
                  trak.timescale = be32(b, body + 12)
                  trak.dur = be32(b, body + 16)
                }
              case "hdlr" if trak != null && body + 12 <= bEnd =>
                if (fourcc(b, body + 8) == "vide") trak.video = true
              case "stts" if trak != null && body + 8 <= bEnd =>
                val n = be32(b, body + 4).toInt
                var s = 0L
                var i = 0
                while (i < n && body + 8 + 8 * i + 8 <= bEnd) {
                  s += be32(b, body + 8 + 8 * i); i += 1
                }
                trak.samples = s
              case _ =>
            }
            o = (o + size).toInt
          }
        }
      }
      walk(0, b.length, null)
      if (best == null || best.w < 0)
        Seq(false, null, null, null, null, "no video trak")
      else {
        val duration: Any =
          if (movTimescale > 0 && movDuration >= 0)
            movDuration.toDouble / movTimescale
          else if (best.timescale > 0 && best.dur >= 0)
            best.dur.toDouble / best.timescale
          else null
        val fps: Any =
          if (best.samples > 0 && best.timescale > 0 && best.dur > 0)
            best.samples.toDouble / (best.dur.toDouble / best.timescale)
          else null
        Seq(true, best.w, best.h, fps, duration, null)
      }
    } catch {
      case e: Exception => Seq(false, null, null, null, null, e.toString)
    }
  }

  /** Minimal RIFF walk: find `avih` (frame count, width, height) and
    * the first `vids` `strh` (dwRate/dwScale → fps). */
  private[graft] def probeAvi(b: Array[Byte]): Seq[Any] = {
    try {
      var totalFrames = -1L
      var width = -1L
      var height = -1L
      var fps = -1.0
      val isAvi = Riff.walkAvi(b) { (id, bodyL, _, _) =>
        val body = bodyL
        if (id == "avih" && body + 40 <= b.length) {
          totalFrames = Riff.u32(b, body.toInt + 16)
          width = Riff.u32(b, body.toInt + 32)
          height = Riff.u32(b, body.toInt + 36)
        } else if (id == "strh" && body + 32 <= b.length &&
          Riff.fourcc(b, body.toInt) == "vids") {
          val scale = Riff.u32(b, body.toInt + 20)
          val rate = Riff.u32(b, body.toInt + 24)
          if (scale > 0) fps = rate.toDouble / scale
        }
        // header probe: stop once both avih and a video strh are read
        width < 0 || fps < 0
      }
      if (!isAvi)
        return Seq(false, null, null, null, null, "not an AVI file")
      if (width < 0 || height < 0)
        Seq(false, null, null, null, null, "no avih header")
      else {
        val dur = if (fps > 0 && totalFrames >= 0) totalFrames / fps else null
        Seq(true, width.toInt, height.toInt,
          if (fps > 0) fps else null, dur, null)
      }
    } catch {
      case e: Exception => Seq(false, null, null, null, null, e.toString)
    }
  }
}

/** Caption↔image agreement scoring — the contract of the reference's
  * text2image family (DPF/filters/text2image/t2i_filter.py:7-27:
  * image payload + caption metadata column; clip_filter.py:87-118:
  * batched two-tower similarity, one score column per row), with
  * DETERMINISTIC stand-ins for both towers so the operator is
  * testable without model weights:
  *
  *  - image tower: one pixel pass → 8-dim vector (mean luminance,
  *    contrast, colorfulness, log-resolution, per-quadrant luminance
  *    means), exact IEEE arithmetic;
  *  - text tower: hashed char-trigram bag → signed 8-dim buckets
  *    (String.hashCode is JVM-spec-fixed, so the embedding is stable
  *    across JVMs);
  *  - score: cosine squashed to [0,1] via 0.5·(1+cos).
  *
  * Production swaps the two towers for an ONNX vision/text encoder
  * pair behind this same `DataFilter` trait; the caption-metadata
  * plumbing, batching, null semantics (undecodable image OR missing
  * caption → null), and 1:1 merge are what this class pins.
  */
final case class Text2ImageScoreFilter(captionColumn: String = "caption",
    override val batchSize: Int = 64) extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override val metadataColumns = Seq(captionColumn)
  override def name = s"Text2ImageScoreFilter($captionColumn)"
  override val resultSchema = StructType(Seq(
    StructField("t2i_score", DoubleType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      val caption = in.metadata.get(captionColumn) match {
        case Some(s: String) if s.nonEmpty => s
        case _ => null
      }
      in.payloads.get(Modality.Image.name) match {
        case Some(bytes) if caption != null =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(null))
            else Some(Seq(score(img, caption)))
          } catch { case _: Exception => Some(Seq(null)) }
        case _ => Some(Seq(null))
      }
    }

  private[operators] def score(img: BufferedImage, caption: String): Double = {
    val a = imageVec(img)
    val b = textVec(caption)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < 8) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.5
    else (1.0 + dot / (math.sqrt(na) * math.sqrt(nb))) * 0.5
  }

  /** One pixel pass: global luma/contrast/color/log-res + quadrant
    * luminance means. */
  private[operators] def imageVec(img: BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    var sumL = 0.0
    var sumL2 = 0.0
    var sumC = 0.0
    val quad = new Array[Double](4)
    val quadN = new Array[Long](4)
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
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        quad(q) += l
        quadN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val mean = sumL / n
    Array(
      mean / 255.0,
      math.sqrt(math.max(sumL2 / n - mean * mean, 0.0)) / 255.0,
      sumC / n / 510.0,
      math.log1p(n) / 20.0,
      if (quadN(0) == 0) 0.0 else quad(0) / quadN(0) / 255.0,
      if (quadN(1) == 0) 0.0 else quad(1) / quadN(1) / 255.0,
      if (quadN(2) == 0) 0.0 else quad(2) / quadN(2) / 255.0,
      if (quadN(3) == 0) 0.0 else quad(3) / quadN(3) / 255.0)
  }

  /** Signed hashed trigram bag, L1-style accumulation into 8 buckets. */
  private[operators] def textVec(caption: String): Array[Double] = {
    val s = caption.toLowerCase.trim
    val v = new Array[Double](8)
    if (s.length < 3) { v(java.lang.Math.floorMod(s.hashCode, 8)) = 1.0; return v }
    var i = 0
    while (i + 3 <= s.length) {
      val hc = s.substring(i, i + 3).hashCode
      val bucket = java.lang.Math.floorMod(hc, 8)
      v(bucket) += (if ((hc & 8) == 0) 1.0 else -1.0)
      i += 1
    }
    v
  }
}

/** Zero-shot label scoring — the contract of the reference's
  * CLIPLabelsFilter (DPF/filters/images/cliplabels_filter.py:18:
  * templated text embeds per label averaged, one score column per
  * label named via label2column `:74-76`). With `imageModelPath` /
  * `textModelPath` set, REAL two-tower `.onnx` models run on the
  * in-repo interpreter exactly as [[OnnxTwoTowerFilter]] does —
  * label embeddings are computed ONCE per executor (every label ×
  * template prompt in one text-tower forward, then averaged per
  * label, the reference's per-session cache), and each batch costs
  * one [N,3,S,S] image-tower pass plus N·L cosines. Without model
  * paths the deterministic [[Text2ImageScoreFilter]] stand-in towers
  * take over (pixel-stat image vec, hashed-trigram text vec), so the
  * per-label column fan-out, templating, batching and null semantics
  * run and test without weights. */
final case class ClipLabelsFilter(labels: Seq[String],
    templates: Seq[String] = Seq("a photo of a {label}", "{label}"),
    imageModelPath: Option[String] = None,
    textModelPath: Option[String] = None,
    inputSize: Int = 32,
    vocabSize: Int = 4096,
    maxTokens: Int = 16,
    override val batchSize: Int = 64) extends DataFilter {
  require(labels.nonEmpty, "need at least one label")
  require(templates.nonEmpty, "need at least one template")
  require(imageModelPath.isDefined == textModelPath.isDefined,
    "provide both tower models or neither")
  require(inputSize > 0 && vocabSize >= 2 && maxTokens > 0)
  override val modalities = Seq(Modality.Image)
  override def name = s"ClipLabelsFilter(${labels.mkString(",")})"

  /** label2column, cliplabels_filter.py:74-76 */
  def columnFor(label: String): String = s"""clip score "$label""""

  override val resultSchema = StructType(
    labels.map(l => StructField(columnFor(l), DoubleType)))

  private val t2i = Text2ImageScoreFilter()
  private val pixels = OnnxPixelScoreFilter(inputSize = inputSize)
  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  /** Every label's templated prompts as the text tower's token-id
    * rows, label-major: row l·T+t is template t of label l. */
  private def promptIds: Array[Float] =
    labels.toArray.flatMap(l => templates.toArray.flatMap(t =>
      graft.operators.Towers.tokenIds(
        t.replace("{label}", l), vocabSize, maxTokens)))

  // ONNX label embeddings: ONE text-tower forward over all
  // labels × templates, rows averaged per label — computed lazily per
  // executor (the session-cache discipline of OnnxModel.forPath)
  @transient private lazy val onnxLabelVecs: Array[Array[Float]] = {
    val model = graft.onnx.OnnxModel.forPath(
      textModelPath.get, hadoopConf.get())
    val nRows = labels.length * templates.length
    val emb = model.forward(graft.onnx.Onnx.Tensor(
      Seq(nRows, maxTokens), promptIds))
    require(emb.data.length % nRows == 0,
      s"text tower emitted ${emb.dims} for $nRows prompts")
    val e = emb.data.length / nRows
    labels.indices.toArray.map { l =>
      val sum = new Array[Float](e)
      templates.indices.foreach { t =>
        val o = (l * templates.length + t) * e
        var i = 0
        while (i < e) { sum(i) += emb.data(o + i); i += 1 }
      }
      sum.map(_ / templates.length)
    }
  }

  // stand-in label embeddings: templated prompts embedded and
  // AVERAGED once per filter instance, same shape as the reference's
  // per-session cache
  @transient private lazy val labelVecs: Seq[Array[Double]] =
    labels.map { l =>
      val sum = new Array[Double](8)
      templates.foreach { t =>
        val v = t2i.textVec(t.replace("{label}", l))
        var i = 0
        while (i < 8) { sum(i) += v(i); i += 1 }
      }
      sum.map(_ / templates.length)
    }

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    val decoded: Seq[Option[BufferedImage]] = batch.map { in =>
      in.payloads.get(Modality.Image.name).flatMap { bytes =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      }
    }
    val live = decoded.flatten
    val scored: Seq[Seq[Any]] = imageModelPath match {
      case Some(ip) if live.nonEmpty =>
        val imgEmb = graft.onnx.OnnxModel.forPath(ip, hadoopConf.get())
          .forward(graft.onnx.Onnx.Tensor(
            Seq(live.length, 3, inputSize, inputSize),
            live.toArray.flatMap(pixels.pixelTensor)))
        require(imgEmb.data.length % live.length == 0,
          s"image tower emitted ${imgEmb.dims} for ${live.length} rows")
        val e = imgEmb.data.length / live.length
        val lv = onnxLabelVecs
        lv.foreach(v => require(v.length == e,
          s"tower widths differ: image $e vs text ${v.length}"))
        live.indices.map(i => lv.toSeq.map(v => Double.box(
          graft.operators.Towers.cosine01(imgEmb.data, i * e, v, 0, e))))
      case Some(_) => Nil
      case None =>
        live.map { img =>
          val iv = t2i.imageVec(img)
          labelVecs.map(lv => Double.box(cosine01(iv, lv)))
        }
    }
    val it = scored.iterator
    decoded.map {
      case Some(_) => Some(it.next())
      case None => Some(Seq.fill[Any](labels.length)(null))
    }
  }

  private def cosine01(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < 8) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.5
    else (1.0 + dot / (math.sqrt(na) * math.sqrt(nb))) * 0.5
  }
}
