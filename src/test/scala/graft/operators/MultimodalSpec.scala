package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 13 + y * 7 + seed * 999) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val df = Seq(
    (1L, png(1, 64, 48)),
    (2L, png(2, 16, 16)),
    (3L, Array[Byte](9, 9, 9)), // undecodable
    (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "img")

  test("decodeImages: dimensions for good rows, ok=false for bad") {
    val out = Multimodal.decodeImages(df, "img")
      .select(col("id"), col("image_info.width"), col("image_info.ok"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getBoolean(2))))
      .toMap
    assert(out(1L) == (Some(64), true))
    assert(out(2L) == (Some(16), true))
    assert(out(3L) == (None, false))
    assert(out(4L) == (None, false))
  }

  test("resizeImages downscales to max-size and re-decodes correctly") {
    val out = Multimodal.resizeImages(df, "img", "img2",
      Resizer.MaxSize(32))
    val decoded = Multimodal.decodeImages(out, "img2", "info2")
      .select(col("id"), col("info2.width"), col("info2.height"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    assert(decoded(1L) == (Some(32), Some(24))) // 64x48 → 32x24
    assert(decoded(2L) == (Some(16), Some(16))) // already small: untouched
  }

  test("sampleFrames: deterministic schedule, stubbed payload") {
    val vids = Seq((1L, Array[Byte](1, 2, 3), 10.0),
      (2L, null.asInstanceOf[Array[Byte]], 5.0)).toDF("id", "v", "duration")
    val out = Multimodal.sampleFrames(vids, "v", "duration", n = 4)
      .select(col("id"), col("frames")).collect()
    val frames = out.find(_.getLong(0) == 1L).get
      .getSeq[org.apache.spark.sql.Row](1)
    assert(frames.length == 4)
    assert(frames.map(_.getDouble(0)) == Seq(1.25, 3.75, 6.25, 8.75))
    assert(frames.map(_.getString(1)).distinct.length == 4)
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("pseudoEmbedding: right shape, deterministic, in range") {
    val out1 = Multimodal.pseudoEmbedding(df, "img", 8)
      .select(col("id"), col("embedding")).collect()
    val out2 = Multimodal.pseudoEmbedding(df, "img", 8)
      .select(col("id"), col("embedding")).collect()
    val e1 = out1.find(_.getLong(0) == 1L).get.getSeq[Double](1)
    val e2 = out2.find(_.getLong(0) == 1L).get.getSeq[Double](1)
    assert(e1.length == 8)
    assert(e1 == e2)
    assert(e1.forall(v => v >= -0.5 && v < 0.5))
    assert(out1.find(_.getLong(0) == 4L).get.isNullAt(1))
  }

  test("withPayloadBytes round-trips files written to disk") {
    val dir = java.nio.file.Files.createTempDirectory("mm-bytes").toFile
    val bytes = png(7, 20, 10)
    val f = new java.io.File(dir, "a.png")
    val os = new java.io.FileOutputStream(f)
    os.write(bytes); os.close()
    val pdf = Seq((1L, f.getAbsolutePath), (2L, dir + "/missing.png"))
      .toDF("id", "path")
    val out = Multimodal.withPayloadBytes(pdf, "path", "img")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("img")))
      .toMap
    assert(out(1L).get.sameElements(bytes))
    assert(out(2L).isEmpty)
  }
}
