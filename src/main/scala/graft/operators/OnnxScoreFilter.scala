package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.types._
import graft.core.Modality
import graft.onnx.OnnxModel

/** Model-backed image scoring with a REAL model file — the
  * reference's aesthetic / NSFW shape (DPF/filters/images/
  * aesthetic_improved_filter.py:22-110, nsfw_filter.py:45-90:
  * decode → featurize → session.run on the batch → score column),
  * executed by the in-repo ONNX interpreter ([[graft.onnx.OnnxModel]])
  * since this environment ships no onnxruntime. The session contract
  * matches the reference exactly:
  *
  *  - one parsed session per EXECUTOR (JVM-wide cache keyed by model
  *    path — [[OnnxModel.forPath]]), reused across tasks and batches;
  *  - the whole batch runs as ONE [N, D] tensor through the network
  *    (the GPU-batching boundary in production);
  *  - undecodable images score null and are excluded from the tensor
  *    without disturbing their neighbors' rows.
  *
  * `modelPath = None` falls back to [[ImageScoreFilter]]'s
  * deterministic algebraic head — same schema, no file needed.
  *
  * The feature vector is the same 4 pixel statistics the stand-in
  * uses (mean luminance, contrast, colorfulness, log-resolution), so
  * a trained head is a drop-in `.onnx` with input [N, 4] → output
  * [N, 1]; image-embedding models plug in by widening `featurize`.
  */
final case class OnnxScoreFilter(modelPath: Option[String] = None,
    scoreColumn: String = "image_score",
    outputIndex: Int = 0,
    override val batchSize: Int = 64) extends DataFilter {
  require(outputIndex >= 0)
  override val modalities = Seq(Modality.Image)
  override def name = s"OnnxScoreFilter(${modelPath.getOrElse("standin")})"
  override val resultSchema = StructType(Seq(
    StructField(scoreColumn, DoubleType)))

  // captured DRIVER-side at construction so spark.hadoop.* settings
  // (s3a credentials, endpoints, custom fs impls) reach the executor
  // that opens the model file; a bare executor-side Configuration
  // would see only classpath defaults. Falls back when the filter is
  // constructed outside a session (plain unit tests).
  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    val decoded: Seq[Option[BufferedImage]] = batch.map { in =>
      in.payloads.get(Modality.Image.name).flatMap { bytes =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      }
    }
    val feats = decoded.flatMap(_.map(featurize))
    val scores: Seq[Double] = modelPath match {
      case Some(path) if feats.nonEmpty =>
        // ONE forward pass for the whole batch — the batching boundary
        OnnxHeads.scores(OnnxModel.forPath(path, hadoopConf.get()),
          graft.onnx.Onnx.Tensor(Seq(feats.length, FeatureDim),
            feats.flatten.toArray), outputIndex)
      case Some(_) => Nil
      case None => feats.map(standinHead)
    }
    // re-align scores with the full batch: decoded rows consume the
    // next score, undecodable rows stay null
    val it = scores.iterator
    decoded.map {
      case Some(_) => Some(Seq(Double.box(it.next())))
      case None => Some(Seq(null))
    }
  }

  val FeatureDim = 4

  /** Same one-pass pixel statistics as [[ImageScoreFilter.score]] —
    * shared via [[PixelStats]], so the model's input features cannot
    * drift from the stand-in head's. */
  private[operators] def featurize(img: BufferedImage): Array[Float] = {
    val s = PixelStats.of(img)
    val n = s.n
    val meanL = s.sumL / n / 255.0
    val contrast = math.sqrt(
      math.max(s.sumL2 / n - (s.sumL / n) * (s.sumL / n), 0.0)) / 255.0
    val color = s.sumC / n / 510.0
    val logRes = math.log1p(n) / 20.0
    Array(meanL.toFloat, contrast.toFloat, color.toFloat, logRes.toFloat)
  }

  /** The no-model fallback: [[ImageScoreFilter]]'s fixed linear head
    * + algebraic squash over the same features. */
  private def standinHead(f: Array[Float]): Double = {
    val z = -1.0 + 1.5 * f(0) + 4.0 * f(1) + 2.0 * f(2) + 1.0 * f(3)
    (1.0 + z / (1.0 + math.abs(z))) * 0.5
  }
}

/** Shared batch→head plumbing for the ONNX score filters: run the
  * batch tensor through the model once and read each row's score at
  * `outputIndex` — [N, 1] scalar heads and [N, K] class heads (e.g.
  * an NSFW softmax pair, nsfw_filter.py:67-80) both work. */
private[operators] object OnnxHeads {
  def scores(model: OnnxModel, batch: graft.onnx.Onnx.Tensor,
      outputIndex: Int): Seq[Double] = {
    val rows = batch.dims.head
    val out = model.forward(batch)
    require(out.data.length % rows == 0,
      s"model emitted ${out.dims} for a $rows-row batch — expected N rows")
    val k = out.data.length / rows
    require(outputIndex < k,
      s"outputIndex $outputIndex out of range for $k model outputs")
    (0 until rows).map(i => out.data(i * k + outputIndex).toDouble)
  }
}

/** Shared decode-side image→tensor preprocessing for every raw-pixel
  * ONNX head (score, detection, recognition): bilinear resize to a
  * fixed (w, h), then channel-planar (CHW) floats in [0, 1] — RGB
  * planes, or one ITU-R 601 luminance plane when `grayscale`. */
private[operators] object PixelTensors {
  def chw(img: BufferedImage, w: Int, h: Int,
      grayscale: Boolean): Array[Float] = {
    val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val hw = w * h
    val out = new Array[Float](if (grayscale) hw else 3 * hw)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = scaled.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val p = y * w + x
        if (grayscale) {
          out(p) = ((r * 299 + gg * 587 + b * 114) / 1000) / 255f
        } else {
          out(p) = r / 255f
          out(hw + p) = gg / 255f
          out(2 * hw + p) = b / 255f
        }
        x += 1
      }
      y += 1
    }
    out
  }
}

/** Raw-pixel CNN scoring — the input mode the reference's real
  * detector models use (a watermark / NSFW conv net consumes the
  * image itself, not summary statistics; watermarks_filter.py:65-104
  * resizes to a fixed square and normalizes before the session run).
  * Decode → bilinear-resize to `inputSize`² → normalized [0,1] CHW
  * float tensor → ONE [N, C, H, W] forward pass per batch through
  * the interpreter's conv tier. Same session / batching / null
  * discipline as [[OnnxScoreFilter]]; `modelPath = None` falls back
  * to a deterministic mean-pixel head so the plumbing runs and tests
  * without a model file. */
final case class OnnxPixelScoreFilter(modelPath: Option[String] = None,
    scoreColumn: String = "image_cnn_score",
    inputSize: Int = 32,
    grayscale: Boolean = false,
    outputIndex: Int = 0,
    override val batchSize: Int = 16) extends DataFilter {
  require(inputSize > 0 && outputIndex >= 0)
  override val modalities = Seq(Modality.Image)
  override def name = s"OnnxPixelScoreFilter(${modelPath.getOrElse("standin")})"
  override val resultSchema = StructType(Seq(
    StructField(scoreColumn, DoubleType)))
  private val channels = if (grayscale) 1 else 3

  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    val decoded: Seq[Option[BufferedImage]] = batch.map { in =>
      in.payloads.get(Modality.Image.name).flatMap { bytes =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      }
    }
    val tensors = decoded.flatMap(_.map(pixelTensor))
    val scores: Seq[Double] = modelPath match {
      case Some(path) if tensors.nonEmpty =>
        OnnxHeads.scores(OnnxModel.forPath(path, hadoopConf.get()),
          graft.onnx.Onnx.Tensor(
            Seq(tensors.length, channels, inputSize, inputSize),
            tensors.flatten.toArray), outputIndex)
      case Some(_) => Nil
      case None => tensors.map(standinHead)
    }
    val it = scores.iterator
    decoded.map {
      case Some(_) => Some(Seq(Double.box(it.next())))
      case None => Some(Seq(null))
    }
  }

  /** Decode-side preprocessing: bilinear resize to the model's fixed
    * square, then channel-planar (CHW) floats in [0, 1] — RGB planes,
    * or one ITU-R 601 luminance plane when `grayscale`
    * ([[PixelTensors.chw]], shared with the OCR heads). */
  private[operators] def pixelTensor(img: BufferedImage): Array[Float] =
    PixelTensors.chw(img, inputSize, inputSize, grayscale)

  /** No-model fallback: mean pixel value through the same algebraic
    * squash the feature-head stand-in uses. */
  private def standinHead(t: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < t.length) { s += t(i); i += 1 }
    val z = -1.0 + 2.0 * (s / t.length)
    (1.0 + z / (1.0 + math.abs(z))) * 0.5
  }
}

/** The reference's named model-backed image filters, each a thin
  * configuration of [[OnnxScoreFilter]] with the reference's score
  * column name — pass the `.onnx` head trained for each task and the
  * session/batching/null plumbing is shared:
  *
  *  - aesthetic: DPF/filters/images/aesthetic_filter.py (score col
  *    `aesthetic_score_<model>` simplified to `aesthetic_score`);
  *  - improved aesthetic: aesthetic_improved_filter.py:22-110
  *    (LAION aesthetic-predictor head over CLIP features);
  *  - NSFW: nsfw_filter.py:45-90 — a 2-class softmax head, scored by
  *    the NSFW class probability (outputIndex 1);
  *  - watermark: watermarks_filter.py:65-104 — 2-class
  *    (watermark/clean), scored by the watermark class.
  */
object ScoreFilters {
  def aesthetic(modelPath: Option[String] = None): OnnxScoreFilter =
    OnnxScoreFilter(modelPath, "aesthetic_score")
  def improvedAesthetic(modelPath: Option[String] = None): OnnxScoreFilter =
    OnnxScoreFilter(modelPath, "improved_aesthetic_score")
  def nsfw(modelPath: Option[String] = None): OnnxScoreFilter =
    OnnxScoreFilter(modelPath, "nsfw_score", outputIndex = 1)
  def watermark(modelPath: Option[String] = None): OnnxScoreFilter =
    OnnxScoreFilter(modelPath, "watermark_score", outputIndex = 1)
}
