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

  /** CTC alphabet for the ONNX recognizer head: class 0 is the CTC
    * blank, class i+1 maps to `DefaultAlphabet(i)`. */
  val DefaultAlphabet: String = "abcdefghijklmnopqrstuvwxyz0123456789 "

  /** Merge horizontal runs of hot grid cells into line boxes in
    * PIXEL coordinates — shared by the contrast stand-in (cell size
    * = `cellW` = `cellH` = cellSize) and the ONNX score-map path
    * (cell size = image-to-map scale, generally fractional). Scans
    * row-major so box order is deterministic. */
  private[operators] def runsToBoxes(hot: Array[Array[Boolean]],
      cellW: Double, cellH: Double, maxW: Int, maxH: Int)
      : Seq[(Int, Int, Int, Int)] = {
    val ch = hot.length
    val cw = if (ch == 0) 0 else hot(0).length
    val out = Seq.newBuilder[(Int, Int, Int, Int)]
    var ry = 0
    while (ry < ch) {
      var rx = 0
      while (rx < cw) {
        if (hot(ry)(rx)) {
          var endX = rx
          while (endX + 1 < cw && hot(ry)(endX + 1)) endX += 1
          out += ((math.floor(rx * cellW).toInt,
            math.floor(ry * cellH).toInt,
            math.min(math.ceil((endX + 1) * cellW), maxW.toDouble).toInt,
            math.min(math.ceil((ry + 1) * cellH), maxH.toDouble).toInt))
          rx = endX + 1
        } else rx += 1
      }
      ry += 1
    }
    out.result()
  }

  /** Greedy CTC decode of one [T, C] logit block: per-timestep
    * argmax, collapse repeats, drop blanks (class 0). */
  private[operators] def ctcGreedy(logits: Array[Float], steps: Int,
      classes: Int, alphabet: String): String = {
    val sb = new StringBuilder
    var prev = -1
    var t = 0
    while (t < steps) {
      var best = 0
      var bestV = logits(t * classes)
      var c = 1
      while (c < classes) {
        val v = logits(t * classes + c)
        if (v > bestV) { bestV = v; best = c }
        c += 1
      }
      if (best != prev && best != 0 && best - 1 < alphabet.length)
        sb.append(alphabet(best - 1))
      prev = best
      t += 1
    }
    sb.toString
  }
}

/** Detection stage (CRAFT contract): image payload in, `text_boxes`
  * JSON column out.
  *
  * With `modelPath` set, a REAL `.onnx` detection net runs on the
  * interpreter's conv tier (the CRAFT shape,
  * text_detection_filter.py:12-60: resize → normalize → net →
  * per-pixel region-score map → threshold → merge into boxes). The
  * whole batch runs as ONE [N, 3, S, S] forward (every image resizes
  * to the same square, so detection batches like the score filters);
  * the output score map `[N, 1, h, w]` (or `[N, h, w]`) thresholds
  * at `mapThreshold` and hot cells merge into line boxes scaled back
  * to original image coordinates.
  *
  * Without a model file, the stand-in detector marks grid cells
  * whose local luminance contrast (max − min) clears a threshold —
  * text is high-contrast against its background — and merges
  * horizontally adjacent hot cells the same way. Both paths share
  * [[OcrFilters.runsToBoxes]], so box format and ordering are
  * identical. */
final case class TextDetectionFilter(cellSize: Int = 8,
    contrast: Int = 96,
    modelPath: Option[String] = None,
    inputSize: Int = 64,
    mapThreshold: Double = 0.5,
    override val batchSize: Int = 64)
    extends DataFilter {
  require(cellSize > 0 && contrast >= 0 && inputSize > 0)
  override val modalities = Seq(Modality.Image)
  override def name =
    s"TextDetectionFilter(${modelPath.getOrElse(s"$cellSize,$contrast")})"
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("n_boxes", IntegerType),
    StructField("text_boxes", StringType),
    StructField("error", StringType)))

  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    val decoded: Seq[Either[String, BufferedImage]] = batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Left("payload missing")
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Left("undecodable image") else Right(img)
          } catch { case e: Exception => Left(e.toString) }
      }
    }
    val detected: Seq[Either[String, Seq[(Int, Int, Int, Int)]]] =
      modelPath match {
        case Some(path) => detectOnnx(path, decoded)
        case None => decoded.map(_.map(detect))
      }
    detected.map {
      case Left(err) => Some(Seq(false, null, null, err))
      case Right(boxes) =>
        Some(Seq(true, boxes.length, OcrFilters.boxesToJson(boxes), null))
    }
  }

  /** One [N, 3, S, S] forward for the batch's decodable images, then
    * per-image score-map threshold + run merge back in original
    * pixel coordinates. Model load / forward / shape errors THROW
    * and fail the task (the OnnxScoreFilter contract: per-row errors
    * are for bad DATA — a broken model over a 100M-image corpus must
    * not complete "successfully" as 100M error rows). */
  private def detectOnnx(path: String,
      decoded: Seq[Either[String, BufferedImage]])
      : Seq[Either[String, Seq[(Int, Int, Int, Int)]]] = {
    val imgs = decoded.collect { case Right(img) => img }
    if (imgs.isEmpty) return decoded.map(_.map(_ => Nil))
    val model = graft.onnx.OnnxModel.forPath(path, hadoopConf.get())
    val tensors = imgs.map(
      PixelTensors.chw(_, inputSize, inputSize, grayscale = false))
    val out = model.forward(graft.onnx.Onnx.Tensor(
      Seq(imgs.length, 3, inputSize, inputSize),
      tensors.flatten.toArray))
    // accept [N, 1, h, w] or [N, h, w] score maps
    val spatial = out.dims match {
      case Seq(n, 1, h, w) if n == imgs.length => (h, w)
      case Seq(n, h, w) if n == imgs.length => (h, w)
      case d => throw new IllegalArgumentException(
        s"detection model emitted dims $d for ${imgs.length} images —" +
          " expected an [N, 1, h, w] or [N, h, w] score map")
    }
    val (mh, mw) = spatial
    val per = mh * mw
    val boxesPerImg = imgs.zipWithIndex.map { case (img, i) =>
      val hot = Array.tabulate(mh, mw)((y, x) =>
        out.data(i * per + y * mw + x) >= mapThreshold)
      OcrFilters.runsToBoxes(hot,
        img.getWidth.toDouble / mw, img.getHeight.toDouble / mh,
        img.getWidth, img.getHeight)
    }
    val it = boxesPerImg.iterator
    decoded.map(_.map(_ => it.next()))
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
    OcrFilters.runsToBoxes(hot, cellSize.toDouble, cellSize.toDouble,
      img.getWidth, img.getHeight)
  }
}

/** Recognition stage (OCR contract): image payload PLUS the
  * detection stage's `text_boxes` column — requested through
  * [[DataFilter.metadataColumns]], the reference's
  * filter-needs-prior-filter-column mechanism (ocr_filter.py:78-82).
  * Crops each box from the real pixels.
  *
  * With `modelPath` set, a REAL `.onnx` recognizer runs on the
  * interpreter, following the generic CRNN/CTC recognizer convention:
  * grayscale crop resized to `cropH`×`cropW` → net → per-timestep
  * class logits → greedy CTC decode over `alphabet`, class 0 =
  * blank. (The reference's vendored `ocr_model/` defaults to a
  * TPS-ResNet-BiLSTM-Attn head with ATTENTION decoding over 100×32
  * crops — ocr_filter.py + ocr_model/; attention decode is
  * autoregressive and needs that model's learned embedding, so the
  * bring-your-own-model contract here is the CTC convention any
  * CRNN-family export satisfies, with crop geometry configurable to
  * the reference's 100×32 via `cropW`/`cropH`.) ALL crops of the
  * batch run as ONE [M, 1, H, W] forward —
  * the per-box work batches across images, not per image. Accepted
  * head shapes: [M, T, C] sequence logits, or [M, C] single-step.
  *
  * Without a model file, the recognizer head is a deterministic
  * digest of the cropped grayscale cells ("word-" prefixed), so
  * outputs are stable for specs and dedup while the plumbing
  * (dependency, cropping, batching, JSON out) is the production
  * shape. A row whose `text_boxes` is null/absent reports the
  * dependency error instead of guessing. */
final case class OcrFilter(boxesColumn: String = "text_boxes",
    modelPath: Option[String] = None,
    cropW: Int = 32, cropH: Int = 32,
    alphabet: String = OcrFilters.DefaultAlphabet,
    override val batchSize: Int = 64) extends DataFilter {
  require(cropW > 0 && cropH > 0 && alphabet.nonEmpty)
  override val modalities = Seq(Modality.Image)
  override def metadataColumns: Seq[String] = Seq(boxesColumn)
  override def name =
    s"OcrFilter($boxesColumn${modelPath.fold("")("," + _)})"
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("ocr_texts", ArrayType(StringType)),
    StructField("error", StringType)))

  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    // decode + box-parse per row first; model rows then batch as one
    // tensor across the WHOLE batch's crops
    val prepped: Seq[Either[Seq[Any], (BufferedImage,
        Seq[(Int, Int, Int, Int)])]] = batch.map { in =>
      val boxesJson = in.metadata.get(boxesColumn) match {
        case Some(s: String) => s
        case _ => null
      }
      in.payloads.get(Modality.Image.name) match {
        case None => Left(Seq(false, null, "payload missing"))
        case _ if boxesJson == null =>
          Left(Seq(false, null,
            s"missing dependency column $boxesColumn — run a text " +
              "detection filter first"))
        case Some(bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) Left(Seq(false, null, "undecodable image"))
            else Right((img, OcrFilters.boxesFromJson(boxesJson)))
          } catch {
            case e: Exception => Left(Seq(false, null, e.toString))
          }
      }
    }
    modelPath match {
      case None =>
        prepped.map {
          case Left(err) => Some(err)
          case Right((img, boxes)) =>
            Some(Seq(true, boxes.map(b => recognize(img, b)), null))
        }
      case Some(path) =>
        val crops = prepped.collect { case Right((img, boxes)) =>
          boxes.map(cropTensor(img, _))
        }
        val flat = crops.flatten
        // model load / forward / class-count errors THROW and fail
        // the task (the OnnxScoreFilter contract) — per-row errors
        // above are for bad DATA only
        val texts: Seq[String] =
          if (flat.isEmpty) Nil else recognizeOnnx(path, flat)
        val it = texts.iterator
        prepped.map {
          case Left(err) => Some(err)
          case Right((_, boxes)) =>
            Some(Seq(true, boxes.map(_ => it.next()), null))
        }
    }
  }

  /** Grayscale [1, cropH, cropW] plane of one box crop (clamped to
    * the image; empty boxes give a zero plane). */
  private[operators] def cropTensor(img: BufferedImage,
      box: (Int, Int, Int, Int)): Array[Float] = {
    val (x0, y0, x1, y1) = box
    val cx0 = math.max(0, x0)
    val cy0 = math.max(0, y0)
    val cx1 = math.min(img.getWidth, x1)
    val cy1 = math.min(img.getHeight, y1)
    if (cx1 <= cx0 || cy1 <= cy0) return new Array[Float](cropW * cropH)
    PixelTensors.chw(
      img.getSubimage(cx0, cy0, cx1 - cx0, cy1 - cy0),
      cropW, cropH, grayscale = true)
  }

  /** ONE [M, 1, H, W] forward for every crop in the batch, then
    * greedy CTC per crop. */
  private def recognizeOnnx(path: String,
      crops: Seq[Array[Float]]): Seq[String] = {
    val model = graft.onnx.OnnxModel.forPath(path, hadoopConf.get())
    val out = model.forward(graft.onnx.Onnx.Tensor(
      Seq(crops.length, 1, cropH, cropW), crops.flatten.toArray))
    val (steps, classes) = out.dims match {
      case Seq(m, t, c) if m == crops.length => (t, c)
      case Seq(m, c) if m == crops.length => (1, c)
      case d => throw new IllegalArgumentException(
        s"recognizer emitted dims $d for ${crops.length} crops — " +
          "expected [M, T, C] sequence logits or [M, C]")
    }
    require(classes >= 2 && classes <= alphabet.length + 1,
      s"recognizer emits $classes classes but the CTC alphabet has " +
        s"${alphabet.length} symbols + blank")
    val per = steps * classes
    crops.indices.map { i =>
      OcrFilters.ctcGreedy(
        out.data.slice(i * per, (i + 1) * per), steps, classes, alphabet)
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
