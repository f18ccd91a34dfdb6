package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Modality
import graft.sources.PayloadLoader

/** Media file transforms: rewrite each sample's payload and merge the
  * changed metadata back by path — the reference's
  * BaseFilesTransforms / ImageResizeTransforms
  * (DPF/transforms/base_file_transforms.py:18-120,
  * image_resize_transforms.py:11-47; merge
  * processors/processor_mixins.py:13-43).
  *
  * Deliberate re-spec (SURVEY.md §7.4 risk 3): the reference rewrites
  * files IN PLACE, which is unsafe on object stores and destroys the
  * input on partial failure. Here transforms are copy-on-write into
  * an output directory; the returned Processor's path column points
  * at the new files. The reference's thread pool becomes executor
  * tasks; the per-file function runs inside mapPartitions with bytes
  * loaded task-side (tar shards read once per archive).
  */
object FileTransforms {

  /** Result row of one file transform. */
  private val resultSchema = StructType(Seq(
    StructField("__new_path", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("transform_error", StringType)))

  /** Resize every image payload per [[Resizer]] geometry, writing
    * `outDir/<basename>` and updating `image_path`, `width`,
    * `height` (+`transform_error` for undecodable payloads, whose
    * rows keep their original path). */
  def resizeImages(p: Processor, outDir: String, mode: Resizer.Mode,
      downscaleOnly: Boolean = true): Processor = {
    val spark = p.df.sparkSession
    val key = Modality.Image.pathColumn
    require(p.columns.contains(key), s"dataset has no $key column")
    val hadoopConf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(outDir))

    val outSchema = StructType(
      StructField(key, StringType, nullable = false) +: resultSchema.fields)
    val results = p.df.select(col(key)).na.drop()
      .mapPartitions { it =>
        val conf = hadoopConf.get()
        val loader = new PayloadLoader(conf)
        val fs = new Path(outDir).getFileSystem(conf)
        val rows = it.toSeq
        val tarWants = rows.iterator.map(_.getString(0))
          .flatMap(PayloadLoader.splitTarPath)
          .toSeq.groupBy(_._1).map { case (a, m) => a -> m.map(_._2).toSet }
        val tarBytes = tarWants.flatMap { case (a, ms) =>
          loader.loadTarMembers(a, ms).map { case (m, b) => (a, m) -> b }
        }
        rows.iterator.map { r =>
          val src = r.getString(0)
          val basename = src.substring(src.lastIndexOf('/').max(
            src.lastIndexOf('!')) + 1)
          val bytesOpt = PayloadLoader.splitTarPath(src) match {
            case Some((a, m)) => tarBytes.get((a, m))
            case None =>
              try Some(loader.loadFile(src)) catch { case _: Exception => None }
          }
          val out = bytesOpt match {
            case None => Seq(null, null, null, "payload unreadable")
            case Some(bytes) =>
              try {
                val img = ImageIO.read(new ByteArrayInputStream(bytes))
                if (img == null) Seq(null, null, null, "undecodable image")
                else {
                  val (tw, th) = Resizer.targetSize(
                    img.getWidth, img.getHeight, mode, downscaleOnly)
                  val outBytes =
                    if (tw == img.getWidth && th == img.getHeight) bytes
                    else {
                      val dst = new java.awt.image.BufferedImage(
                        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
                      val g = dst.createGraphics()
                      g.drawImage(img, 0, 0, tw, th, null)
                      g.dispose()
                      val bos = new ByteArrayOutputStream()
                      ImageIO.write(dst, "png", bos)
                      bos.toByteArray
                    }
                  val dest = new Path(outDir, basename)
                  val os = fs.create(dest, true)
                  try os.write(outBytes) finally os.close()
                  Seq(dest.toString, tw, th, null)
                }
              } catch {
                case e: Exception => Seq(null, null, null, e.toString)
              }
          }
          Row.fromSeq(src +: out)
        }
      }(Encoders.row(outSchema))

    // merge-by-path like the reference, then swap in the new path
    val dropped = Seq("width", "height").foldLeft(p.df)(
      (d, c) => if (d.columns.contains(c)) d.drop(c) else d)
    val merged = Processor(dropped, p.config).mergeResult(results, key)
    merged.transform(_.withColumn(key,
        coalesce(col("__new_path"), col(key))).drop("__new_path"))
  }

  /** Video payload rewrite — the ffmpeg-free MJPEG subset of the
    * reference's VideoFFMPEGTransforms (resize / fps-reduce / cut,
    * DPF/transforms/video_ffmpeg_transforms.py:30-143) via
    * [[Mjpeg.transform]]. Same copy-on-write discipline as
    * [[resizeImages]]: `outDir/<basename>` + updated `video_path`,
    * untransformable payloads keep their path and report
    * `transform_error`. */
  def transformVideos(p: Processor, outDir: String,
      op: Mjpeg.Op): Processor = {
    val spark = p.df.sparkSession
    val key = Modality.Video.pathColumn
    require(p.columns.contains(key), s"dataset has no $key column")
    val hadoopConf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(outDir))
    val outSchema = StructType(Seq(
      StructField(key, StringType, nullable = false),
      StructField("__new_path", StringType),
      StructField("transform_error", StringType)))
    val results = p.df.select(col(key)).na.drop()
      .mapPartitions { it =>
        val conf = hadoopConf.get()
        val loader = new PayloadLoader(conf)
        val fs = new Path(outDir).getFileSystem(conf)
        val rows = it.toSeq
        // one pass per tar archive for ALL its requested members —
        // per-row loads would re-scan the archive once per member
        // (O(N²) bytes on an N-member shard)
        val tarWants = rows.iterator.map(_.getString(0))
          .flatMap(PayloadLoader.splitTarPath)
          .toSeq.groupBy(_._1).map { case (a, m) => a -> m.map(_._2).toSet }
        val tarBytes = tarWants.flatMap { case (a, ms) =>
          loader.loadTarMembers(a, ms).map { case (m, b) => (a, m) -> b }
        }
        rows.iterator.map { r =>
          val src = r.getString(0)
          val basename = src.substring(src.lastIndexOf('/').max(
            src.lastIndexOf('!')) + 1)
          val out =
            try {
              val bytes = PayloadLoader.splitTarPath(src) match {
                case Some((a, m)) =>
                  tarBytes.getOrElse((a, m),
                    throw new java.io.FileNotFoundException(src))
                case None => loader.loadFile(src)
              }
              Mjpeg.transform(bytes, op) match {
                case Left(err) => Seq(null, err)
                case Right(outBytes) =>
                  val dest = new Path(outDir, basename)
                  val os = fs.create(dest, true)
                  try os.write(outBytes) finally os.close()
                  Seq(dest.toString, null)
              }
            } catch {
              case e: Exception => Seq(null, e.toString)
            }
          Row.fromSeq(src +: out)
        }
      }(Encoders.row(outSchema))
    val merged = p.mergeResult(results, key)
    merged.transform(_.withColumn(key,
      coalesce(col("__new_path"), col(key))).drop("__new_path"))
  }
}
