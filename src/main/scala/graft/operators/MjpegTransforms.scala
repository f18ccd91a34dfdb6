package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JVM video transforms for MJPEG-in-AVI payloads — the
  * ffmpeg-free subset of the reference's VideoFFMPEGTransforms
  * (DPF/transforms/video_ffmpeg_transforms.py:30-143: resize / fps /
  * cut via an ffmpeg subprocess). Motion-JPEG frames are standalone
  * JPEGs, so resize re-encodes each frame with javax.imageio, fps
  * reduction drops frames, and cut truncates — and the result is a
  * valid AVI written by [[Mjpeg.write]] that round-trips through
  * [[VideoFrames]] and VideoInfoFilter. Inter-coded codecs still
  * need ffmpeg and are reported as untransformable.
  */
object Mjpeg {

  /** Minimal spec-complete MJPEG AVI writer: RIFF(AVI ) { LIST(hdrl)
    * { avih, LIST(strl){ strh vids/MJPG, strf BITMAPINFOHEADER } },
    * LIST(movi){ 00dc ×frames } }. Enough structure for any MJPEG-
    * capable player plus this library's own reader and prober. */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Double): Array[Byte] = {
    require(frames.nonEmpty, "cannot write an AVI with zero frames")
    require(fps > 0, s"fps must be positive, got $fps")
    val bos = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val maxFrame = frames.map(_.length).max.toLong
    val scale = 1000L
    val rate = math.round(fps * scale)
    // sizes, innermost out: strh(56) strf(40) → strl list body,
    // avih(56) → hdrl list body, frame chunks → movi list body
    val strlBody = 4 + (8 + 56) + (8 + 40)
    val hdrlBody = 4 + (8 + 56) + (8 + strlBody)
    val moviBody = 4 + frames.map(f => 8L + f.length + (f.length & 1)).sum
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    tag("RIFF"); w32(riffBody); tag("AVI ")
    tag("LIST"); w32(hdrlBody.toLong); tag("hdrl")
    tag("avih"); w32(56)
    w32(math.round(1e6 / fps)) // usec per frame
    w32(maxFrame * rate / scale) // max bytes/sec
    w32(0); w32(0)
    w32(frames.length.toLong)
    w32(0); w32(1); w32(maxFrame)
    w32(width.toLong); w32(height.toLong)
    bos.write(new Array[Byte](16))
    tag("LIST"); w32(strlBody.toLong); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("MJPG")
    w32(0); w32(0); w32(0)
    w32(scale); w32(rate)
    w32(0); w32(frames.length.toLong); w32(maxFrame)
    w32(0xffffffffL) // quality: default
    w32(0); w32(0); w32(0)
    tag("strf"); w32(40)
    w32(40); w32(width.toLong); w32(height.toLong)
    w32(1L | (24L << 16)) // planes 1, bitcount 24
    tag("MJPG")
    w32(width.toLong * height * 3)
    w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(moviBody); tag("movi")
    frames.foreach { f =>
      tag("00dc"); w32(f.length.toLong); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** fps from the avih usec-per-frame field (our own writer and any
    * standard AVI carry it); None when absent/unparseable. */
  def fps(bytes: Array[Byte]): Option[Double] = {
    var found: Option[Double] = None
    Riff.walkAvi(bytes) { (id, body, _, _) =>
      if (id == "avih" && body + 4 <= bytes.length) {
        val usec = Riff.u32(bytes, body.toInt)
        if (usec > 0) found = Some(1e6 / usec)
      }
      found.isEmpty // stop at the first header hit
    }
    found
  }

  sealed trait Op
  /** Re-encode every frame at [[Resizer]] geometry. */
  final case class Resize(mode: Resizer.Mode, downscaleOnly: Boolean = true)
      extends Op
  /** Keep every k-th frame (fps divides by k). */
  final case class KeepEvery(k: Int) extends Op {
    require(k >= 1)
  }
  /** Truncate to the first n frames. */
  final case class CutFrames(n: Int) extends Op {
    require(n >= 1)
  }

  /** Apply one transform to an MJPEG AVI payload. */
  def transform(bytes: Array[Byte], op: Op): Either[String, Array[Byte]] =
    VideoFrames.frameChunks(bytes).flatMap { chunks =>
      if (chunks.isEmpty) return Left("no video frame chunks")
      val srcFps = fps(bytes).getOrElse(30.0)
      val frames = chunks.map { case (off, len) =>
        java.util.Arrays.copyOfRange(bytes, off, off + len)
      }
      op match {
        case Resize(mode, downOnly) =>
          // ffmpeg-scale semantics: ONE output geometry for the whole
          // stream, derived from the first frame — MJPEG legally
          // allows per-frame dims, but the AVI header declares a
          // single size, so every frame is forced to the same target
          val out = Seq.newBuilder[Array[Byte]]
          var dims: (Int, Int) = null
          var err: String = null
          frames.foreach { f =>
            if (err == null) {
              val img = ImageIO.read(new ByteArrayInputStream(f))
              if (img == null) err = "undecodable frame"
              else {
                if (dims == null)
                  dims = Resizer.targetSize(
                    img.getWidth, img.getHeight, mode, downOnly)
                val (tw, th) = dims
                if (tw == img.getWidth && th == img.getHeight) out += f
                else {
                  val dst = new BufferedImage(tw, th,
                    BufferedImage.TYPE_INT_RGB)
                  val g = dst.createGraphics()
                  g.drawImage(img, 0, 0, tw, th, null)
                  g.dispose()
                  val b = new ByteArrayOutputStream()
                  ImageIO.write(dst, "jpg", b)
                  out += b.toByteArray
                }
              }
            }
          }
          if (err != null) Left(err)
          else Right(write(out.result(), dims._1, dims._2, srcFps))
        case KeepEvery(k) =>
          val kept = frames.zipWithIndex.collect {
            case (f, i) if i % k == 0 => f
          }
          firstDims(kept.head).map(d =>
            write(kept, d._1, d._2, srcFps / k))
        case CutFrames(n) =>
          val kept = frames.take(n)
          firstDims(kept.head).map(d => write(kept, d._1, d._2, srcFps))
      }
    }

  private def firstDims(frame: Array[Byte]): Either[String, (Int, Int)] = {
    val img = ImageIO.read(new ByteArrayInputStream(frame))
    if (img == null) Left("undecodable frame")
    else Right((img.getWidth, img.getHeight))
  }
}
