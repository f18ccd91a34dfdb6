package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.types._
import graft.core.Modality
import graft.onnx.{Onnx, OnnxModel}

/** Model-backed captioning with REAL autoregressive decoding — the
  * reference's BLIP shape (DPF/filters/images/
  * blip_captioning_filter.py:18: encode the image, greedy-decode a
  * token sequence, detokenize to a caption column) run on the
  * in-repo interpreter:
  *
  *  - vision encoder (.onnx): pixel tensor `[1, 3, size, size]` →
  *    conditioning embedding `[1, E]`;
  *  - decoder (.onnx, TWO inputs `img` and `ids`): conditioning +
  *    the token ids so far → per-position logits `[1, L, V]`; the
  *    loop reads the last live position, argmaxes, appends, and
  *    stops at EOS or `maxTokens` — the exact greedy-decode loop a
  *    production VLM runs, at toy scale (the interpreter's attention
  *    tier runs encoder blocks inside the decoder if the model has
  *    them);
  *  - detokenize: id 0 = pad, 1 = BOS, 2 = EOS, 3+i = `vocab(i)`;
  *    caption = words joined.
  *
  * Decoding is per-row (autoregressive length varies per image);
  * the vision encoder still runs once per row here because each
  * decode consumes its own embedding immediately — batch the
  * encoder if a profiler ever says so. Sessions cache per executor.
  * With no model paths the measured-pixel-statistics stand-in of
  * [[CaptionFilter]] takes over. Undecodable images caption null.
  */
final case class OnnxCaptionFilter(
    visionModelPath: Option[String] = None,
    decoderModelPath: Option[String] = None,
    vocab: Seq[String] = OnnxCaptionFilter.DefaultVocab,
    captionColumn: String = "blip_caption",
    prompt: Option[String] = None,
    inputSize: Int = 16,
    maxTokens: Int = 12,
    override val batchSize: Int = 16) extends DataFilter {
  require(visionModelPath.isDefined == decoderModelPath.isDefined,
    "provide both the vision and decoder models or neither")
  require(maxTokens >= 2 && vocab.nonEmpty)
  /** Prompt tokens prefix the id buffer (the LLaVA conditioning
    * shape, llava_captioning_filter.py:88: the prompt is part of the
    * model context); they hash into the word-id space [3, 3+|vocab|)
    * and must leave at least BOS + one generation slot. */
  private val promptIds: Array[Float] = prompt match {
    case None => Array.empty
    case Some(p) =>
      val ids = p.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(w => (3 + java.lang.Math.floorMod(w.hashCode,
          vocab.length)).toFloat)
      require(ids.length + 2 <= maxTokens,
        s"prompt '$p' leaves no room to generate in $maxTokens tokens")
      ids
  }
  override val modalities = Seq(Modality.Image)
  override def name =
    s"OnnxCaptionFilter(${visionModelPath.getOrElse("standin")})"
  override val resultSchema = StructType(Seq(
    StructField(captionColumn, StringType)))

  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  private val pixels = OnnxPixelScoreFilter(inputSize = inputSize)
  private val standin = CaptionFilter(captionColumn)

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    // model load/misconfiguration stays OUTSIDE the per-row try: a
    // wrong path or unsupported graph must fail the task loudly, not
    // silently caption the whole corpus null (the OnnxScoreFilter
    // contract). Per-row nulls are for bad DATA only.
    val models = (visionModelPath, decoderModelPath) match {
      case (Some(vp), Some(dp)) =>
        val conf = hadoopConf.get()
        Some((OnnxModel.forPath(vp, conf), OnnxModel.forPath(dp, conf)))
      case _ => None
    }
    batch.map { in =>
      in.payloads.get(Modality.Image.name) match {
        case None => Some(Seq(null))
        case Some(bytes) =>
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case None => Some(Seq(null))
            case Some(i) => models match {
              case Some((vm, dm)) => Some(Seq(decode(vm, dm, i)))
              case None => Some(Seq(standin.caption(i)))
            }
          }
      }
    }
  }

  private val Pad = 0f
  private val Bos = 1f
  private val Eos = 2f

  /** Greedy decode: BOS, then argmax of the last live position's
    * logits until EOS or the length cap. */
  private[operators] def decode(vision: OnnxModel, decoder: OnnxModel,
      img: BufferedImage): String = {
    val emb = vision.forward(Onnx.Tensor(
      Seq(1, 3, inputSize, inputSize), pixels.pixelTensor(img)))
    val embIn = Onnx.Tensor(Seq(1, emb.data.length), emb.data)
    require(decoder.graph.inputs.length == 2,
      s"decoder needs (img, ids) inputs, got ${decoder.graph.inputs}")
    val Seq(imgIn, idsIn) = decoder.graph.inputs
    val ids = Array.fill(maxTokens)(Pad)
    System.arraycopy(promptIds, 0, ids, 0, promptIds.length)
    ids(promptIds.length) = Bos
    val words = Seq.newBuilder[String]
    var t = promptIds.length + 1
    var done = false
    while (t < maxTokens && !done) {
      val out = decoder.run(Map(
        imgIn -> embIn,
        idsIn -> Onnx.Tensor(Seq(1, maxTokens), ids.clone())))(
        decoder.graph.outputs.head)
      require(out.dims.length == 3 && out.dims(1) == maxTokens,
        s"decoder must emit [1, $maxTokens, V] logits, got ${out.dims}")
      val v = out.dims(2)
      val o = (t - 1) * v
      var best = 0
      var bestV = Float.NegativeInfinity
      var j = 0
      while (j < v) {
        if (out.data(o + j) > bestV) { bestV = out.data(o + j); best = j }
        j += 1
      }
      if (best == Eos.toInt || best == Pad.toInt) done = true
      else {
        if (best >= 3 && best - 3 < vocab.length) words += vocab(best - 3)
        ids(t) = best.toFloat
        t += 1
      }
    }
    words.result().mkString(" ")
  }
}

object OnnxCaptionFilter {
  /** Default detokenization vocabulary for toy decoders. */
  val DefaultVocab: Seq[String] = Seq(
    "a", "the", "bright", "dark", "photo", "image", "of", "scene",
    "red", "green", "blue", "wide", "tall", "detailed", "flat",
    "outdoor", "indoor", "object", "pattern", "texture")

  /** LLaVA-style prompted captioning over the same decoder loop:
    * reference column naming (`caption {model} prompt {p}`,
    * llava_captioning_filter.py:88) with the prompt tokens in the
    * decode context. */
  def llava(visionModelPath: Option[String], decoderModelPath: Option[String],
      prompt: String = "short", vocab: Seq[String] = DefaultVocab,
      maxTokens: Int = 12): OnnxCaptionFilter =
    OnnxCaptionFilter(visionModelPath, decoderModelPath, vocab,
      s"caption llava prompt $prompt", Some(prompt),
      maxTokens = maxTokens)
}
