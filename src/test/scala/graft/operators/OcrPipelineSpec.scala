package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{DatasetConfig, Modality}
import graft.sources.DatasetReader

/** The CRAFT→OCR two-stage dependency demo: detection emits
  * `text_boxes`, recognition declares it via `metadataColumns` and
  * fails loudly when run out of order — plus the skip-if-exists
  * idempotency interplay when the pipeline reruns.
  */
class OcrPipelineSpec extends SparkSpec {

  /** White page with black "text" bands at known rows (and one blank
    * page): high contrast exactly where the bands are. */
  private def page(bands: Seq[Int], w: Int = 64, h: Int = 64): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0xffffff)
    bands.foreach { by =>
      for (y <- by until math.min(by + 6, h); x <- 4 until w - 4)
        if ((x / 3) % 2 == 0) img.setRGB(x, y, 0x000000)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft-ocr").toFile
    val pages = Seq(
      "text1.png" -> png(page(Seq(8, 24))),
      "text2.png" -> png(page(Seq(40))),
      "blank.png" -> png(page(Nil)))
    pages.foreach { case (n, b) =>
      val f = new File(d, s"img/$n")
      f.getParentFile.mkdirs()
      val o = new FileOutputStream(f)
      try o.write(b) finally o.close()
    }
    val csv = "image_path,caption\n" +
      pages.map(p => s"img/${p._1},c").mkString("\n")
    val o = new FileOutputStream(new File(d, "data.csv"))
    try o.write(csv.getBytes("UTF-8")) finally o.close()
    d
  }

  private def processor = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(dir, "data.csv").getAbsolutePath))

  test("detector marks the text bands and leaves blank pages empty") {
    val det = TextDetectionFilter(cellSize = 8, contrast = 96)
    val boxes = det.detect(page(Seq(8, 24)))
    assert(boxes.nonEmpty)
    // every box sits on one of the two band rows (cell rows 1..3)
    assert(boxes.forall { case (_, y0, _, y1) =>
      (y0 >= 8 && y1 <= 16) || (y0 >= 24 && y1 <= 32) })
    assert(det.detect(page(Nil)).isEmpty)
  }

  test("two-stage pipeline: detection column feeds OCR via metadataColumns") {
    val result = Pipeline.run(processor, Seq(
      Pipeline.dataFilterStage(TextDetectionFilter()),
      Pipeline.dataFilterStage(OcrFilter())))
    assert(result.failed.isEmpty)
    assert(result.ran == Seq("TextDetectionFilter(8,96)",
      "OcrFilter(text_boxes)"))
    val rows = result.processor.df
      .select(element_at(split(col("image_path"), "/"), -1),
        col("n_boxes"), col("ocr_texts"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2))).toList
    val byName = rows.map(r => r._1 -> r).toMap
    assert(byName("text1.png")._2 > 0)
    assert(byName("text1.png")._3.length == byName("text1.png")._2,
      "one recognized token per detected box")
    assert(byName("text1.png")._3.forall(_.startsWith("word-")))
    assert(byName("blank.png")._2 == 0)
    assert(byName("blank.png")._3.isEmpty)
    // determinism: same pixels, same tokens
    val again = Pipeline.run(processor, Seq(
      Pipeline.dataFilterStage(TextDetectionFilter()),
      Pipeline.dataFilterStage(OcrFilter())))
      .processor.df
      .select(element_at(split(col("image_path"), "/"), -1), col("ocr_texts"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(again("text1.png") == byName("text1.png")._3)
  }

  test("rerun skips both stages once their columns exist") {
    val first = Pipeline.run(processor, Seq(
      Pipeline.dataFilterStage(TextDetectionFilter()),
      Pipeline.dataFilterStage(OcrFilter())))
    val rerun = Pipeline.run(first.processor, Seq(
      Pipeline.dataFilterStage(TextDetectionFilter()),
      Pipeline.dataFilterStage(OcrFilter())))
    assert(rerun.ran.isEmpty)
    assert(rerun.skipped == Seq("TextDetectionFilter(8,96)",
      "OcrFilter(text_boxes)"))
  }

  test("OCR before detection fails loudly (missing dependency column)") {
    val result = Pipeline.run(processor, Seq(
      Pipeline.dataFilterStage(OcrFilter())))
    assert(result.ran.isEmpty)
    assert(result.failed.map(_._1) == Seq("OcrFilter(text_boxes)"))
  }

  test("null dependency value reports the error per row, not a crash") {
    val f = OcrFilter()
    val res = f.processBatch(Seq(FilterInput("k",
      Map(Modality.Image.name -> png(page(Seq(8)))),
      Map("text_boxes" -> null))))
    val row = res.head.get
    assert(row(0) == false)
    assert(row(2).toString.contains("missing dependency column"))
  }

  test("boxes JSON round-trips") {
    val boxes = Seq((0, 8, 60, 16), (4, 24, 32, 32))
    assert(OcrFilters.boxesFromJson(OcrFilters.boxesToJson(boxes)) == boxes)
    assert(OcrFilters.boxesFromJson("[]") == Nil)
  }
}
