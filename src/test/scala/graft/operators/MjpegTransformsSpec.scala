package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import graft.SparkSpec
import graft.core._
import graft.sources.DatasetReader

/** MJPEG video transforms: resize / fps-reduce / cut rebuild a valid
  * AVI (round-trips through VideoFrames AND VideoInfoFilter), and
  * the copy-on-write dataset transform updates `video_path`.
  */
class MjpegTransformsSpec extends SparkSpec {

  private def jpeg(seed: Int, w: Int = 64, h: Int = 48): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 5 + y * 9 + seed * 40000) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private val avi = Mjpeg.write((0 until 6).map(jpeg(_)), 64, 48, 30.0)

  test("writer output round-trips through reader and prober") {
    val Right((total, _, frames)) = VideoFrames.extractSampled(avi, 6)
    assert(total == 6)
    assert(frames.forall(f =>
      ImageIO.read(new ByteArrayInputStream(f)) != null))
    val probe = VideoInfoFilter().processBatch(Seq(FilterInput("k",
      Map(Modality.Video.name -> avi), Map.empty))).head.get
    assert(probe(0) == true, probe.toString)
    assert(probe(1) == 64 && probe(2) == 48)
    assert(math.abs(probe(3).asInstanceOf[Double] - 30.0) < 0.2)
    assert(Mjpeg.fps(avi).exists(f => math.abs(f - 30.0) < 0.2))
  }

  test("resize re-encodes every frame at the target geometry") {
    val Right(out) = Mjpeg.transform(avi, Mjpeg.Resize(Resizer.MaxSize(32)))
    val Right((total, _, frames)) = VideoFrames.extractSampled(out, 6)
    assert(total == 6)
    frames.foreach { f =>
      val img = ImageIO.read(new ByteArrayInputStream(f))
      assert(img.getWidth == 32 && img.getHeight == 24,
        s"${img.getWidth}x${img.getHeight}")
    }
  }

  test("fps reduction keeps every k-th frame and divides fps") {
    val Right(out) = Mjpeg.transform(avi, Mjpeg.KeepEvery(2))
    val Right((total, _, _)) = VideoFrames.extractSampled(out, 10)
    assert(total == 3)
    assert(Mjpeg.fps(out).exists(f => math.abs(f - 15.0) < 0.2))
  }

  test("cut truncates to the first n frames") {
    val Right(out) = Mjpeg.transform(avi, Mjpeg.CutFrames(2))
    val Right((total, _, frames)) = VideoFrames.extractSampled(out, 10)
    assert(total == 2)
    // first frame is byte-identical to the source's first frame
    val Right((_, _, src)) = VideoFrames.extractSampled(avi, 10)
    assert(frames.head.sameElements(src.head))
  }

  test("non-AVI payload reports an error") {
    assert(Mjpeg.transform(Array[Byte](1, 2, 3),
      Mjpeg.CutFrames(1)).isLeft)
  }

  test("dataset-level transformVideos rewrites paths copy-on-write") {
    val d = Files.createTempDirectory("graft-vidtrans").toFile
    val names = Seq("a.avi" -> avi, "bad.avi" -> Array[Byte](7, 7))
    names.foreach { case (n, b) =>
      val f = new File(d, s"vid/$n"); f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(b) finally o.close()
    }
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(("video_path,caption\n" +
      names.map(n => s"vid/${n._1},c").mkString("\n"))
      .getBytes("UTF-8")) finally o.close()
    val cfg = FilesConfig(new File(d, "data.csv").getAbsolutePath, Seq(
      FilePayload(Modality.Video, "video_path"),
      ColumnPayload(Modality.Text, "caption")))
    val outDir = new File(d, "out").getAbsolutePath
    val p = FileTransforms.transformVideos(
      DatasetReader.readFiles(spark, cfg), outDir, Mjpeg.KeepEvery(3))
    val rows = p.df.select("video_path", "transform_error").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    val (good, goodErr) = rows.find(_._1.endsWith("out/a.avi"))
      .map(kv => (kv._1, kv._2)).get
    assert(goodErr.isEmpty)
    val outBytes = Files.readAllBytes(new File(good).toPath)
    val Right((total, _, _)) = VideoFrames.extractSampled(outBytes, 10)
    assert(total == 2) // 6 frames, keep every 3rd
    // untransformable payload keeps its ORIGINAL path + error column
    val (badPath, badErr) = rows.find(_._1.contains("vid/bad.avi")).get
    assert(badErr.nonEmpty)
    assert(!badPath.contains("/out/"))
  }
}
