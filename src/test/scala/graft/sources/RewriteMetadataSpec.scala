package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DatasetConfig

class RewriteMetadataSpec extends SparkSpec {

  private def png(seed: Int): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, (x + y * 8 + seed * 1000) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("rewriteMetadata updates shard CSVs in place, archives untouched") {
    val root = Files.createTempDirectory("graft-rewrite").toFile
    // build a files dataset, export to shards
    val src = new File(root, "files")
    (0 until 6).foreach { i =>
      val f = new File(src, s"img/$i.png")
      f.getParentFile.mkdirs()
      val os = new FileOutputStream(f)
      os.write(png(i)); os.close()
    }
    val csv = new File(src, "data.csv")
    val os = new FileOutputStream(csv)
    os.write(("image_path,caption" +:
      (0 until 6).map(i => s"img/$i.png,cap $i"))
      .mkString("\n").getBytes("UTF-8"))
    os.close()
    val p = DatasetReader.readFiles(spark,
      DatasetConfig.filesImageText(csv.getAbsolutePath))
    val shardsDir = new File(root, "shards").getAbsolutePath
    val cfg = ShardWriters.saveToShards(p, shardsDir, maxFilesInShard = 3)

    val before = DatasetReader.readShards(spark, cfg)
    val tarSizes = new File(shardsDir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(f => f.getName -> f.length())
      .toMap

    // add a derived column and persist only the metadata
    val enriched = before.withColumnSet("cap_len", length(col("text")))
    ShardWriters.rewriteMetadata(enriched)

    val after = DatasetReader.readShards(spark, cfg)
    assert(after.count() == 6)
    assert(after.columns.contains("cap_len"))
    assert(after.df.select("cap_len").collect().map(_.getInt(0)).toSet
      == Set(5))
    // archives were not rewritten
    val tarSizesAfter = new File(shardsDir).listFiles()
      .filter(_.getName.endsWith(".tar")).map(f => f.getName -> f.length())
      .toMap
    assert(tarSizes == tarSizesAfter)
    assert(Validators.validate(after).isValid)
  }
}
