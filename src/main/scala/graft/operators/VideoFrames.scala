package graft.operators

import org.apache.spark.sql.types._
import graft.core.Modality

/** Real (pure-JVM) video frame extraction for MJPEG-in-AVI — the
  * decode step that was stubbed behind
  * [[Multimodal.sampleFrames]]'s md5 placeholders. Motion-JPEG
  * stores every frame as a complete, independently-decodable JPEG
  * inside the AVI `movi` list (`##dc`/`##db` chunks), so a stock JVM
  * can extract AND decode frames with javax.imageio — no ffmpeg, no
  * native codec. Inter-coded formats (H.264 etc.) still need a real
  * decoder; they surface as `is_correct=false` with an error, the
  * same null-on-undecodable contract as every media filter here.
  *
  * Mirrors the reference's ImageFilterAdapter frame schedule
  * (DPF/filters/videos/image_filter_adapter.py:55-74): n evenly
  * spaced picks across the frame count, then an image filter runs on
  * each extracted frame.
  */
object VideoFrames {

  /** Evenly spaced frame picks: index_i = floor((i + 0.5) · total/n),
    * deduplicated (n > total collapses to every frame once). */
  def sampleIndices(total: Int, n: Int): Seq[Int] = {
    require(n > 0, s"frame sample count must be positive, got $n")
    if (total <= 0) Nil
    else (0 until n).map(i => ((i + 0.5) * total / n).toInt)
      .map(math.min(_, total - 1)).distinct
  }

  /** Walk the RIFF tree ([[Riff.walkAvi]]) and return every video
    * frame chunk's (offset, length) in stream order — `##dc`/`##db`
    * chunks inside the `movi` list (including `rec ` groupings).
    * Left(reason) when the container isn't a parseable AVI. */
  def frameChunks(b: Array[Byte]): Either[String, IndexedSeq[(Int, Int)]] = {
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    try {
      val isAvi = Riff.walkAvi(b) { (id, body, size, path) =>
        val inMovi = path.contains("movi") || path.contains("rec ")
        if (inMovi && isFrameId(id) && body + size <= b.length)
          frames += ((body.toInt, size.toInt))
        true // frame listing wants the whole tree
      }
      if (!isAvi) Left("not an AVI file") else Right(frames.result())
    } catch {
      case e: Exception => Left(e.toString)
    }
  }

  /** Extract the sampled frames of an MJPEG AVI as standalone JPEG
    * byte arrays: (total frame count, picked indices, frame bytes). */
  def extractSampled(bytes: Array[Byte], n: Int)
      : Either[String, (Int, Seq[Int], Seq[Array[Byte]])] =
    frameChunks(bytes).flatMap { chunks =>
      if (chunks.isEmpty) Left("no video frame chunks in movi list")
      else {
        val idx = sampleIndices(chunks.length, n)
        val frames = idx.map { i =>
          val (off, len) = chunks(i)
          java.util.Arrays.copyOfRange(bytes, off, off + len)
        }
        Right((chunks.length, idx, frames))
      }
    }
}

/** Frame extraction as a [[DataFilter]]: one row per video in, the
  * sampled frames out as an `array<binary>` column (each element a
  * complete JPEG for MJPEG sources) — plug any image-consuming stage
  * downstream, or use [[ImageFilterAdapter]] to run an image filter
  * per frame in one pass. */
final case class VideoFrameExtractFilter(nFrames: Int = 4,
    override val batchSize: Int = 16) extends DataFilter {
  override val modalities = Seq(Modality.Video)
  override def name = s"VideoFrameExtractFilter($nFrames)"
  override val resultSchema = StructType(Seq(
    StructField("is_correct", BooleanType),
    StructField("n_frames_total", IntegerType),
    StructField("frame_index", ArrayType(IntegerType)),
    StructField("frames", ArrayType(BinaryType)),
    StructField("error", StringType)))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] =
    batch.map { in =>
      in.payloads.get(Modality.Video.name) match {
        case None => Some(Seq(false, null, null, null, "payload missing"))
        case Some(bytes) =>
          VideoFrames.extractSampled(bytes, nFrames) match {
            case Left(err) => Some(Seq(false, null, null, null, err))
            case Right((total, idx, frames)) =>
              Some(Seq(true, total, idx, frames, null))
          }
      }
    }
}

/** The reference's ImageFilterAdapter
  * (DPF/filters/videos/image_filter_adapter.py:25-84): run an IMAGE
  * filter over the sampled frames of each VIDEO, collecting the
  * per-frame results as arrays aligned with `frame_index`. The inner
  * filter is reused unmodified — each frame is handed to it as a
  * standalone image payload (batched at the inner filter's own
  * batchSize), so every image filter in the library becomes a video
  * filter for free. A frame the inner filter drops (None) yields
  * nulls at its position; an unparseable video yields
  * `is_correct=false` + error, frames untouched.
  */
final case class ImageFilterAdapter(inner: DataFilter, nFrames: Int = 4,
    override val batchSize: Int = 16) extends DataFilter {
  require(inner.modalities == Seq(Modality.Image),
    s"ImageFilterAdapter wraps single-image filters, got ${inner.name} " +
      s"over ${inner.modalities.map(_.name).mkString(",")}")
  override val modalities = Seq(Modality.Video)
  override def metadataColumns: Seq[String] = inner.metadataColumns
  override def name = s"ImageFilterAdapter(${inner.name})"
  override val resultSchema = StructType(
    Seq(StructField("is_correct", BooleanType),
      StructField("n_frames_total", IntegerType),
      StructField("frame_index", ArrayType(IntegerType))) ++
    inner.resultSchema.fields.map(f =>
      StructField(s"frame_${f.name}", ArrayType(f.dataType))) :+
    StructField("error", StringType))

  override def processBatch(batch: Seq[FilterInput]): Seq[Option[Seq[Any]]] = {
    // extract every video's frames first, then run the inner filter
    // over ALL frames of the batch in inner-batchSize groups — the
    // adapter preserves the inner filter's batching boundary (that is
    // where its GPU/native batching would live)
    val extracted = batch.map { in =>
      in.payloads.get(Modality.Video.name) match {
        case None => Left("payload missing")
        case Some(bytes) => VideoFrames.extractSampled(bytes, nFrames)
      }
    }
    val frameInputs = batch.zip(extracted).flatMap {
      case (in, Right((_, idx, frames))) =>
        idx.zip(frames).map { case (i, f) =>
          FilterInput(s"${in.key}#$i",
            Map(Modality.Image.name -> f), in.metadata)
        }
      case _ => Nil
    }
    val frameResults = frameInputs
      .grouped(math.max(1, inner.batchSize))
      .flatMap(g => inner.processBatch(g))
      .toIndexedSeq
    val nInnerFields = inner.resultSchema.fields.length
    var cursor = 0
    batch.zip(extracted).map {
      case (_, Left(err)) =>
        Some(Seq(false, null, null) ++
          Seq.fill[Any](nInnerFields)(null) :+ err)
      case (_, Right((total, idx, _))) =>
        val rs = frameResults.slice(cursor, cursor + idx.length)
        cursor += idx.length
        // transpose per-frame rows into per-field arrays
        val fieldArrays = (0 until nInnerFields).map { fi =>
          rs.map {
            case Some(values) => values(fi)
            case None => null
          }
        }
        Some(Seq(true, total, idx) ++ fieldArrays :+ null)
    }
  }
}
