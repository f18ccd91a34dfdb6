package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.types._
import graft.core.Modality

/** The reference's two-stage OCR pipeline — CRAFT text DETECTION
  * (DPF/filters/images/text_detection_filter.py:12-60) producing a
  * boxes column, then OCR RECOGNITION
  * (DPF/filters/images/ocr_filter.py:20-147) consuming that column
  * via the filter-needs-prior-filter-column mechanism
  * (`metadataColumns`, ocr_filter.py:78-82) and emitting per-box
  * text. This is the library's canonical demo of a DataFilter that
  * DEPENDS on another DataFilter's output running earlier in the
  * same [[Pipeline]].
  *
  * What's real vs stand-in (same split as every neural-model filter
  * here): box geometry, pixel cropping, batching, the JSON column
  * format, and the metadata dependency are real; the CRAFT network
  * is stood in by a local-contrast detector and the recognizer head
  * by a deterministic digest over the cropped pixels — production
  * swaps the two heads behind identical schemas.
  */
object OcrFilters {

  /** Serialize boxes as the reference's stringified-JSON format
    * (ocr_filter.py:147 stores JSON in a plain string column). */
  def boxesToJson(boxes: Seq[(Int, Int, Int, Int)]): String =
    boxes.map { case (x0, y0, x1, y1) => s"[$x0,$y0,$x1,$y1]" }
      .mkString("[", ",", "]")

  private val BoxRe = """\[(\d+),(\d+),(\d+),(\d+)\]""".r

  def boxesFromJson(json: String): Seq[(Int, Int, Int, Int)] =
    BoxRe.findAllMatchIn(json).map(m =>
      (m.group(1).toInt, m.group(2).toInt,
        m.group(3).toInt, m.group(4).toInt)).toSeq

  private[operators] def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }
}

/** Detection stage (CRAFT contract): image payload in, `text_boxes`
  * JSON column out. The stand-in detector marks grid cells whose
  * local luminance contrast (max − min) clears a threshold — text is
  * high-contrast against its background — and merges horizontally
  * adjacent hot cells into line-shaped boxes, scanning in row-major
  * order so box order is deterministic. */
final case class TextDetectionFilter(cellSize: Int = 8,
    contrast: Int = 96, override val batchSize: Int = 64)
    extends DataFilter {
  require(cellSize > 0 && contrast >= 0)
  override val modalities = Seq(Modality.Image)
  override def name = s"TextDetectionFilter($cellSize,$contrast)"
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("n_boxes", IntegerType),
    StructField("text_boxes", StringType),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(false, null, null, "payload missing"))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(false, null, null, "undecodable image"))
            else {
              val boxes = detect(img)
              Some(Seq(true, boxes.length,
                OcrFilters.boxesToJson(boxes), null))
            }
          } catch {
            case e: Exception => Some(Seq(false, null, null, e.toString))
          }
      }
    }

  private[operators] def detect(img: BufferedImage)
      : Seq[(Int, Int, Int, Int)] = {
    val cw = (img.getWidth + cellSize - 1) / cellSize
    val ch = (img.getHeight + cellSize - 1) / cellSize
    val hot = Array.ofDim[Boolean](ch, cw)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var lo = 255
        var hi = 0
        var y = cy * cellSize
        val yEnd = math.min((cy + 1) * cellSize, img.getHeight)
        while (y < yEnd) {
          var x = cx * cellSize
          val xEnd = math.min((cx + 1) * cellSize, img.getWidth)
          while (x < xEnd) {
            val l = OcrFilters.luminance(img.getRGB(x, y))
            if (l < lo) lo = l
            if (l > hi) hi = l
            x += 1
          }
          y += 1
        }
        hot(cy)(cx) = hi - lo >= contrast
        cx += 1
      }
      cy += 1
    }
    // horizontal runs of hot cells → line boxes (clamped to image)
    val out = Seq.newBuilder[(Int, Int, Int, Int)]
    var ry = 0
    while (ry < ch) {
      var rx = 0
      while (rx < cw) {
        if (hot(ry)(rx)) {
          var endX = rx
          while (endX + 1 < cw && hot(ry)(endX + 1)) endX += 1
          out += ((rx * cellSize, ry * cellSize,
            math.min((endX + 1) * cellSize, img.getWidth),
            math.min((ry + 1) * cellSize, img.getHeight)))
          rx = endX + 1
        } else rx += 1
      }
      ry += 1
    }
    out.result()
  }
}

/** Recognition stage (OCR contract): image payload PLUS the
  * detection stage's `text_boxes` column — requested through
  * [[DataFilter.metadataColumns]], the reference's
  * filter-needs-prior-filter-column mechanism (ocr_filter.py:78-82).
  * Crops each box from the real pixels; the recognizer head is a
  * deterministic digest of the cropped grayscale cells ("word-"
  * prefixed), so outputs are stable for specs and dedup while the
  * plumbing (dependency, cropping, per-box batching, JSON out)
  * is the production shape. A row whose `text_boxes` is null/absent
  * reports the dependency error instead of guessing. */
final case class OcrFilter(boxesColumn: String = "text_boxes",
    override val batchSize: Int = 64) extends DataFilter {
  override val modalities = Seq(Modality.Image)
  override def metadataColumns: Seq[String] = Seq(boxesColumn)
  override def name = s"OcrFilter($boxesColumn)"
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("ocr_texts", ArrayType(StringType)),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      val boxesJson = in.metadata.get(boxesColumn) match {
        case Some(s: String) => s
        case _ => null
      }
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(false, null, "payload missing"))
        case _ if boxesJson == null =>
          Some(Seq(false, null,
            s"missing dependency column $boxesColumn — run a text " +
              "detection filter first"))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Some(Seq(false, null, "undecodable image"))
            else {
              val texts = OcrFilters.boxesFromJson(boxesJson)
                .map(b => recognize(img, b))
              Some(Seq(true, texts, null))
            }
          } catch {
            case e: Exception => Some(Seq(false, null, e.toString))
          }
      }
    }

  /** Deterministic recognizer stand-in: fold the cropped region's
    * luminance (quantized to 16 levels so JPEG noise stays out of
    * the digest) into a stable token. Real OCR plugs in here. */
  private[operators] def recognize(img: BufferedImage,
      box: (Int, Int, Int, Int)): String = {
    val (x0, y0, x1, y1) = box
    val cx0 = math.max(0, x0)
    val cy0 = math.max(0, y0)
    val cx1 = math.min(img.getWidth, x1)
    val cy1 = math.min(img.getHeight, y1)
    if (cx1 <= cx0 || cy1 <= cy0) return "word-empty"
    var h = 1125899906842597L // FNV-ish rolling hash over pixels
    var y = cy0
    while (y < cy1) {
      var x = cx0
      while (x < cx1) {
        val q = OcrFilters.luminance(img.getRGB(x, y)) >> 4
        h = h * 31 + q
        x += 1
      }
      y += 1
    }
    f"word-${h & 0xffffffffL}%08x"
  }
}
