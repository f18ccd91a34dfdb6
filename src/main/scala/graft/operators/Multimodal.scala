package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column operators: media payloads travel as
  * opaque `binary` columns with typed metadata beside them, and the
  * decode / resize / frame-sample / feature-extract steps run as
  * partition-batched transforms over those columns.
  *
  * What is REAL here (and tested): the Spark-side plumbing — column
  * schemas, partition batching, null/error propagation, the
  * mapPartitions harness shared with [[DataFilter]]. What is STUBBED:
  * codecs this container does not have. Image decode/resize is real
  * (javax.imageio); video frame-sampling and audio feature extraction
  * are deterministic fakes, clearly marked, swapped for JNI/ffmpeg
  * implementations in production (the reference uses PIL/pyav/
  * soundfile the same way: DPF/filters/images/info_filter.py:22-48,
  * videos/info_filter.py:22-42, audios/info_filter.py:21-40).
  */
object Multimodal {

  /** Attach payload bytes as a `binary` column read from the path
    * column — after this, the frame is (metadata + binary payload),
    * the canonical multimodal layout. Payloads load once, in the
    * partition, with tar grouping (never through a shuffle). */
  def withPayloadBytes(df: DataFrame, pathCol: String,
      bytesCol: String): DataFrame = {
    val hadoopConf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val outSchema = StructType(df.schema.fields :+
      StructField(bytesCol, BinaryType, nullable = true))
    df.mapPartitions { it =>
      val loader = new graft.sources.PayloadLoader(hadoopConf.get())
      val rows = it.toSeq
      val idx = rows.headOption.map(_.fieldIndex(pathCol)).getOrElse(-1)
      val tarWants = rows.iterator
        .flatMap(r => Option(r.getString(idx)))
        .flatMap(graft.sources.PayloadLoader.splitTarPath)
        .toSeq.groupBy(_._1).map { case (a, ms) => a -> ms.map(_._2).toSet }
      val tarBytes = tarWants.flatMap { case (a, ms) =>
        loader.loadTarMembers(a, ms).map { case (m, b) => (a, m) -> b }
      }
      rows.iterator.map { r =>
        val path = Option(r.getString(idx))
        val bytes = path.flatMap { p =>
          graft.sources.PayloadLoader.splitTarPath(p) match {
            case Some((a, m)) => tarBytes.get((a, m))
            case None =>
              try Some(loader.loadFile(p)) catch { case _: Exception => None }
          }
        }
        Row.fromSeq(r.toSeq :+ bytes.orNull)
      }
    }(Encoders.row(outSchema))
  }

  /** Decoded-image struct produced by [[decodeImages]]. */
  final case class ImageInfo(width: Option[Int], height: Option[Int],
      channels: Option[Int], ok: Boolean)

  /** Decode probe over a binary image column (REAL — javax.imageio):
    * adds a struct column with dimensions, null-safe on undecodable
    * payloads. */
  def decodeImages(df: DataFrame, bytesCol: String,
      outCol: String = "image_info"): DataFrame = {
    val decode = udf { (bytes: Array[Byte]) =>
      if (bytes == null) ImageInfo(None, None, None, ok = false)
      else try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) ImageInfo(None, None, None, ok = false)
        else ImageInfo(Some(img.getWidth), Some(img.getHeight),
          Some(img.getColorModel.getNumComponents), ok = true)
      } catch { case _: Exception => ImageInfo(None, None, None, ok = false) }
    }
    df.withColumn(outCol, decode(col(bytesCol)))
  }

  /** Re-encode images resized per [[Resizer]] geometry (REAL):
    * binary→binary column map, batched per partition. */
  def resizeImages(df: DataFrame, bytesCol: String, outCol: String,
      mode: Resizer.Mode, downscaleOnly: Boolean = true): DataFrame = {
    val resize = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          val (tw, th) = Resizer.targetSize(
            img.getWidth, img.getHeight, mode, downscaleOnly)
          if (tw == img.getWidth && th == img.getHeight) bytes
          else {
            val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.drawImage(img, 0, 0, tw, th, null)
            g.dispose()
            val out = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", out)
            out.toByteArray
          }
        }
      } catch { case _: Exception => null }
    }
    df.withColumn(outCol, resize(col(bytesCol)))
  }

  /** Frame-sample positions for a video column (STUB decode):
    * the sampling schedule (which timestamps to grab for `n` frames
    * of a `duration`-second video) is real and deterministic — the
    * per-frame pixel decode is the stubbed step, returning md5-tagged
    * placeholders where production plugs an ffmpeg/JNI decoder.
    * Mirrors the fractional-position frame pick of the reference's
    * ImageFilterAdapter (videos/image_filter_adapter.py:55-74).
    * For MJPEG-in-AVI sources the decode is NOT a stub anymore —
    * [[VideoFrames]] / [[VideoFrameExtractFilter]] extract real,
    * javax.imageio-decodable JPEG frames. */
  def sampleFrames(df: DataFrame, bytesCol: String, durationCol: String,
      n: Int, outCol: String = "frames"): DataFrame = {
    require(n > 0)
    // real: evenly-spaced sample times t_i = duration * (i + 0.5) / n
    val times = (0 until n).map(i =>
      round(col(durationCol) * ((i + 0.5) / n), 3))
    // STUB: frame payload = md5(bytes) + frame index tag, standing in
    // for the decoded frame until a codec is available
    val frames = array(times.zipWithIndex.map { case (t, i) =>
      struct(t.as("t"),
        md5(concat(col(bytesCol), lit(i.toString))).as("frame_stub"))
    }: _*)
    df.withColumn(outCol,
      when(col(bytesCol).isNull || col(durationCol).isNull, lit(null))
        .otherwise(frames))
  }

  /** Deterministic pseudo-embedding over a binary column (STUB
    * feature-extract): dim doubles derived from md5(bytes || i) —
    * the real plumbing (schema `array<double>`, codegen'd, joins with
    * the ANN operators in [[graft.queries.Similarity]]) with a fake
    * model. Production swaps an ONNX encoder behind the same
    * signature. */
  def pseudoEmbedding(df: DataFrame, bytesCol: String, dim: Int,
      outCol: String = "embedding"): DataFrame = {
    val comps = (0 until dim).map { i =>
      (conv(substring(md5(concat(col(bytesCol), lit(i.toString))), 1, 8),
        16, 10).cast("double") / 4294967296.0) - 0.5
    }
    df.withColumn(outCol,
      when(col(bytesCol).isNull, lit(null)).otherwise(array(comps: _*)))
  }
}
