package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DatasetConfig
import graft.sources.DatasetReader

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val d = Files.createTempDirectory("graft-transforms").toFile
    d.deleteOnExit(); d
  }

  private def png(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 3 + y * 5 + seed) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val filesDir: File = {
    val d = new File(root, "src_files")
    val rows = Seq((0, 64, 48), (1, 16, 16), (2, 100, 50)).map {
      case (i, w, h) =>
        val f = new File(d, s"img/$i.png")
        f.getParentFile.mkdirs()
        val os = new FileOutputStream(f)
        os.write(png(i, w, h)); os.close()
        s"img/$i.png,cap $i"
    }
    val csv = new File(d, "data.csv")
    val os = new FileOutputStream(csv)
    os.write(("image_path,caption" +: rows).mkString("\n").getBytes("UTF-8"))
    os.close()
    d
  }

  test("resizeImages transform: copy-on-write, metadata merged by path") {
    val p = DatasetReader.readFiles(spark, DatasetConfig.filesImageText(
      new File(filesDir, "data.csv").getAbsolutePath))
    val outDir = new File(root, "resized").getAbsolutePath
    val resized = FileTransforms.resizeImages(p, outDir, Resizer.MaxSize(32))
    val rows = resized.df
      .select("image_path", "width", "height", "text").collect()
      .map(r => r.getString(3) -> ((r.getString(0), r.get(1), r.get(2))))
      .toMap
    assert(rows("cap 0")._2 == 32 && rows("cap 0")._3 == 24)
    assert(rows("cap 1")._2 == 16 && rows("cap 1")._3 == 16)
    assert(rows("cap 2")._2 == 32 && rows("cap 2")._3 == 16)
    // all paths now point into outDir, and the files decode at new size
    rows.values.foreach { case (path, _, _) =>
      assert(path.contains("resized"), path)
    }
    val img0 = ImageIO.read(new File(new java.net.URI(
      "file://" + rows("cap 0")._1.stripPrefix("file:"))))
    assert(img0.getWidth == 32 && img0.getHeight == 24)
    // source untouched (copy-on-write)
    val src = ImageIO.read(new File(filesDir, "img/0.png"))
    assert(src.getWidth == 64)
  }

  test("DistinctValueFilter: fn runs per distinct value, joins to all rows") {
    val p = Processor(
      Seq("aa", "bb", "aa", "cc", "aa").toDF("text"),
      DatasetConfig.filesImageText("/nonexistent.csv"))
    val out = DistinctValueFilter(p, "text", "rev", maxBatchChars = 4)(
      batch => batch.map(_.reverse + s"#${batch.length}"))
    val rows = out.df.collect().map(r =>
      r.getString(0) -> r.getString(1)).toList
    assert(rows.size == 5)
    // every aa row got the same enrichment (one computation),
    // batches were capped at ~4 chars → 2 values per batch max
    val aa = rows.filter(_._1 == "aa").map(_._2).distinct
    assert(aa.size == 1)
    assert(aa.head.startsWith("aa#"))
    assert(rows.toMap.apply("bb").startsWith("bb#"))
  }

  test("DistinctValueFilter rejects misaligned fn output") {
    val p = Processor(
      Seq("x", "y").toDF("text"),
      DatasetConfig.filesImageText("/nonexistent.csv"))
    // mergeResult's key validation is eager, so the misalignment
    // surfaces during construction already
    intercept[Exception] {
      DistinctValueFilter(p, "text", "out")(_ => Seq("only-one")).df.collect()
    }
  }
}
