package graft

import java.awt.image.BufferedImage
import java.io.{File, FileOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession

/** Dev probe for the model-backed media path: images/sec through the
  * full Spark pipeline (scan csv → load payload bytes → decode →
  * resize → ONNX forward per batch) at local[32], for both the
  * feature-MLP head and the raw-pixel CNN head. Usage:
  * `graft.MediaScoreProbe [nImages]`. */
object MediaScoreProbe {
  def main(args: Array[String]): Unit = {
    val nImages = args.headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .appName("media-score-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-probe").toFile
    val rows = (0 until nImages).map { i =>
      val img = new BufferedImage(96, 72, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 72) {
        var x = 0
        while (x < 96) {
          img.setRGB(x, y, (x * 31 + y * 17 + i * 77777) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val f = new File(dir, f"img/$i%05d.jpg")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try ImageIO.write(img, "jpg", o) finally o.close()
      f"img/$i%05d.jpg,c$i"
    }
    val csv = new File(dir, "data.csv")
    val o = new FileOutputStream(csv)
    try o.write(("image_path,caption" +: rows).mkString("\n")
      .getBytes("UTF-8")) finally o.close()

    val mlp = new File(dir, "mlp.onnx")
    val om = new FileOutputStream(mlp)
    try om.write(graft.onnx.TestOnnx.mlpBytes) finally om.close()

    def processor = graft.sources.DatasetReader.readFiles(spark,
      graft.core.DatasetConfig.filesImageText(csv.getAbsolutePath))

    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $n rows in $s%.2f s = ${n / s}%.0f img/s")
    }
    // warm the session + scan path once
    processor.df.count()
    timed("feature-MLP head (OnnxScoreFilter)") {
      processor.applyDataFilter(
        graft.operators.OnnxScoreFilter(Some(mlp.getAbsolutePath),
          batchSize = 64)).df.count()
    }
    timed("pixel-CNN head 32x32 (stand-in, decode+resize bound)") {
      processor.applyDataFilter(
        graft.operators.OnnxPixelScoreFilter(None, inputSize = 32,
          batchSize = 64)).df.count()
    }
    spark.stop()
  }
}
