package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.types._
import graft.core.Modality
import graft.onnx.{Onnx, OnnxModel}

/** Caption↔image agreement with REAL two-tower ONNX models — the
  * reference's CLIP-family shape (DPF/filters/text2image/
  * clip_filter.py:87-120: encode the image batch, encode the caption
  * batch, cosine per row) run entirely on the in-repo interpreter,
  * whose attention tier (batched MatMul, LayerNormalization, Gather,
  * Split/Slice/Transpose) executes small transformer text encoders
  * and conv image encoders for real.
  *
  *  - image tower: decode → bilinear resize → normalized CHW →
  *    `[N, C, size, size]` → model → `[N, E]`;
  *  - text tower: deterministic hashing tokenizer (lowercase
  *    whitespace words → `floorMod(hashCode, vocabSize)`, padded /
  *    truncated to `maxTokens`) → `[N, L]` id tensor → model →
  *    `[N, E]` (a BPE vocab is a drop-in replacement — the id-tensor
  *    contract is the same);
  *  - score: cosine of the two embeddings squashed to [0, 1] by
  *    0.5·(1+cos), the [[Text2ImageScoreFilter]] convention.
  *
  * Both towers run once per batch; sessions cache per executor
  * ([[OnnxModel.forPath]]). Rows with an undecodable image or a
  * missing caption score null without disturbing neighbors. With no
  * model paths the deterministic [[Text2ImageScoreFilter]] towers
  * take over, so the operator tests and runs without weights.
  */
final case class OnnxTwoTowerFilter(
    imageModelPath: Option[String] = None,
    textModelPath: Option[String] = None,
    captionColumn: String = "caption",
    scoreColumn: String = "t2i_model_score",
    inputSize: Int = 32,
    vocabSize: Int = 4096,
    maxTokens: Int = 16,
    override val batchSize: Int = 16) extends DataFilter {
  // vocabSize >= 2: id 0 is reserved for padding, word ids land in
  // [1, vocabSize) via floorMod(hash, vocabSize - 1) + 1
  require(inputSize > 0 && vocabSize >= 2 && maxTokens > 0)
  require(imageModelPath.isDefined == textModelPath.isDefined,
    "provide both tower models or neither")
  override val modalities = Seq(Modality.Image)
  override val metadataColumns = Seq(captionColumn)
  override def name =
    s"OnnxTwoTowerFilter(${imageModelPath.getOrElse("standin")})"
  override val resultSchema = StructType(Seq(
    StructField(scoreColumn, DoubleType)))

  private val hadoopConf: SerializableHadoopConf =
    SerializableHadoopConf.capture()

  private val pixels = OnnxPixelScoreFilter(inputSize = inputSize)
  private val standin = Text2ImageScoreFilter(captionColumn)

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    val decoded: Seq[Option[(BufferedImage, String)]] = batch.map { in =>
      val caption = in.metadata.get(captionColumn) match {
        case Some(s: String) if s.nonEmpty => Some(s)
        case _ => None
      }
      val img = in.payloads.get(Modality.Image.name).flatMap { bytes =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      }
      for (i <- img; c <- caption) yield (i, c)
    }
    val live = decoded.flatten
    val scores: Seq[Double] = (imageModelPath, textModelPath) match {
      case (Some(ip), Some(tp)) if live.nonEmpty =>
        val conf = hadoopConf.get()
        val imgEmb = OnnxModel.forPath(ip, conf).forward(Onnx.Tensor(
          Seq(live.length, 3, inputSize, inputSize),
          live.toArray.flatMap(p => pixels.pixelTensor(p._1))))
        val txtEmb = OnnxModel.forPath(tp, conf).forward(Onnx.Tensor(
          Seq(live.length, maxTokens),
          live.toArray.flatMap(p => tokenIds(p._2))))
        // guard before dividing: a tower emitting a non-N first dim
        // would otherwise floor to a bogus width and every row would
        // silently score garbage (the OnnxHeads '% rows' contract)
        require(imgEmb.data.length % live.length == 0,
          s"image tower emitted ${imgEmb.dims} for ${live.length} rows")
        require(txtEmb.data.length % live.length == 0,
          s"text tower emitted ${txtEmb.dims} for ${live.length} rows")
        val e1 = imgEmb.data.length / live.length
        val e2 = txtEmb.data.length / live.length
        require(e1 == e2, s"tower widths differ: $e1 vs $e2")
        live.indices.map(i =>
          cosineScore(imgEmb.data, i * e1, txtEmb.data, i * e2, e1))
      case (Some(_), Some(_)) => Nil
      case _ => live.map(p => standin.score(p._1, p._2))
    }
    val it = scores.iterator
    decoded.map {
      case Some(_) => Some(Seq(Double.box(it.next())))
      case None => Some(Seq(null))
    }
  }

  /** Test hook: the exact image preprocessing the batch path uses. */
  private[operators] def pixelProbe(img: BufferedImage): Array[Float] =
    pixels.pixelTensor(img)

  /** Deterministic hashing tokenizer (see [[Towers.tokenIds]]). */
  private[operators] def tokenIds(caption: String): Array[Float] =
    Towers.tokenIds(caption, vocabSize, maxTokens)

  private def cosineScore(a: Array[Float], ao: Int,
      b: Array[Float], bo: Int, e: Int): Double =
    Towers.cosine01(a, ao, b, bo, e)
}

/** Tower math shared by the CLIP-family filters
  * ([[OnnxTwoTowerFilter]], [[ClipLabelsFilter]]): the hashing
  * tokenizer that feeds text-tower id tensors and the [0, 1]-squashed
  * cosine both towers' embeddings score with. */
private[operators] object Towers {

  /** Deterministic hashing tokenizer: id 0 is the pad token; word
    * ids land in [1, vocabSize). String.hashCode is JVM-spec-fixed,
    * so ids are stable across executors and runs. */
  def tokenIds(caption: String, vocabSize: Int,
      maxTokens: Int): Array[Float] = {
    val out = new Array[Float](maxTokens)
    val words = caption.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var i = 0
    while (i < maxTokens && i < words.length) {
      out(i) = (java.lang.Math.floorMod(words(i).hashCode,
        vocabSize - 1) + 1).toFloat
      i += 1
    }
    out
  }

  /** cosine of a[ao, ao+e) and b[bo, bo+e) squashed to [0, 1] by
    * 0.5·(1+cos); 0.5 for a zero vector on either side. */
  def cosine01(a: Array[Float], ao: Int,
      b: Array[Float], bo: Int, e: Int): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < e) {
      dot += a(ao + i).toDouble * b(bo + i)
      na += a(ao + i).toDouble * a(ao + i)
      nb += b(bo + i).toDouble * b(bo + i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.5
    else (1.0 + dot / (math.sqrt(na) * math.sqrt(nb))) * 0.5
  }
}
