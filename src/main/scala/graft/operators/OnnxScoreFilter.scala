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
    new SerializableHadoopConf(
      scala.util.Try(org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration()))

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
        val model = OnnxModel.forPath(path, hadoopConf.get())
        // ONE forward pass for the whole batch — the batching boundary
        val out = model.forward(
          graft.onnx.Onnx.Tensor(Seq(feats.length, FeatureDim),
            feats.flatten.toArray))
        // [N, 1] scalar heads and [N, K] class heads (e.g. an NSFW
        // softmax pair, nsfw_filter.py:67-80) both work: the score is
        // column `outputIndex` of each row
        require(out.data.length % feats.length == 0,
          s"model emitted ${out.dims} for a ${feats.length}-row batch — " +
            "expected N rows")
        val k = out.data.length / feats.length
        require(outputIndex < k,
          s"outputIndex $outputIndex out of range for $k model outputs")
        (0 until feats.length)
          .map(i => out.data(i * k + outputIndex).toDouble)
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
