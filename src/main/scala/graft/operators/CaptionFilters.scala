package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.types._
import graft.core.Modality

/** Captioning filter family — the contract of the reference's BLIP /
  * LLaVA captioners (DPF/filters/images/blip_captioning_filter.py:18
  * — column `blip_caption`; llava_captioning_filter.py:88-89 —
  * column `caption {model} prompt {p}`), with a DETERMINISTIC
  * captioner so the operator is testable without a VLM: the caption
  * is composed from REAL measured image properties (resolution
  * class, brightness, contrast, colorfulness, dominant hue) through
  * a fixed template. Everything around the head — batching, the
  * metadata prompt column, null-on-undecodable, 1:1 merge, and the
  * video path via [[ImageFilterAdapter]] (per-frame captions, the
  * VideoLLaVA shape) — is the production plumbing; a real VLM swaps
  * in behind [[CaptionFilter.caption]].
  */
final case class CaptionFilter(captionColumn: String = "blip_caption",
    override val batchSize: Int = 16) extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override def name = s"CaptionFilter($captionColumn)"
  override val resultSchema = StructType(Seq(
    StructField(captionColumn, StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(null))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(null))
            else Some(Seq(caption(img)))
          } catch { case _: Exception => Some(Seq(null)) }
      }
    }

  /** Deterministic stand-in head: measured pixel statistics rendered
    * through a fixed template. Same image ⇒ same caption (dedup and
    * spec friendly); distinct content classes ⇒ distinct captions. */
  private[operators] def caption(img: BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val s = PixelStats.of(img)
    val n = s.n
    val meanL = s.sumL / n
    val contrast = math.sqrt(math.max(s.sumL2 / n - meanL * meanL, 0.0))
    val color = s.sumC / n
    val (sr, sg, sb) = (s.sumR, s.sumG, s.sumB)
    val tone =
      if (meanL < 64) "dark" else if (meanL < 160) "midtone" else "bright"
    val texture = if (contrast < 24) "flat" else "detailed"
    val chroma =
      if (color < 16) "monochrome"
      else {
        if (sr >= sg && sr >= sb) "red-toned"
        else if (sg >= sb) "green-toned"
        else "blue-toned"
      }
    val aspect =
      if (w * 3 > h * 4) "wide" else if (h * 3 > w * 4) "tall" else "square"
    s"a $tone $texture $chroma $aspect image, ${w}x$h"
  }
}

/** LLaVA-style prompted captioning: same head, but the output column
  * carries the prompt (the reference templates the column name as
  * `caption {model} prompt {prompt}`, llava_captioning_filter.py:88)
  * and the caption answers it deterministically. */
object CaptionFilters {
  def blip(): CaptionFilter = CaptionFilter("blip_caption")
  def llava(prompt: String = "short"): CaptionFilter =
    CaptionFilter(s"caption llava prompt $prompt")
  /** Video captioning (VideoLLaVA shape): per-frame captions as an
    * array column `frame_<captionColumn>`. */
  def video(nFrames: Int = 4): ImageFilterAdapter =
    ImageFilterAdapter(blip(), nFrames)
}
