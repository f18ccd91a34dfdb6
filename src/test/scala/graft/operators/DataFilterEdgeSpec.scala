package graft.operators

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.core._
import graft.sources.DatasetReader

/** Edge semantics of the enrichment contract: filter→filter column
  * dependencies (the reference's CRAFT→OCR shape), requireComplete
  * merges, row drops, parquet metadata tables. */
class DataFilterEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val filesDir: File = {
    val d = Files.createTempDirectory("graft-edge").toFile
    (0 until 4).foreach { i =>
      val f = new File(d, s"m/$i.bin")
      f.getParentFile.mkdirs()
      val os = new FileOutputStream(f)
      os.write(Array.fill[Byte](i + 1)(i.toByte)); os.close()
    }
    val os = new FileOutputStream(new File(d, "data.csv"))
    os.write(("image_path,caption" +:
      (0 until 4).map(i => s"m/$i.bin,cap $i")).mkString("\n")
      .getBytes("UTF-8"))
    os.close()
    d
  }

  private def proc = DatasetReader.readFiles(spark,
    DatasetConfig.filesImageText(new File(filesDir, "data.csv").getAbsolutePath))

  /** stage 1: byte length of the payload */
  private object SizeFilter extends DataFilter {
    override val modalities = Seq(Modality.Image)
    override val resultSchema = StructType(Seq(
      StructField("payload_len", IntegerType)))
    override def processBatch(b: Seq[FilterInput]) =
      b.map(in => Some(Seq(
        in.payloads.get("image").map(_.length).getOrElse(-1))))
  }

  /** stage 2: consumes stage 1's column via metadataColumns — the
    * CRAFT→OCR dependency (ocr_filter.py:78-82) */
  private object DoubledFilter extends DataFilter {
    override val modalities = Seq(Modality.Image)
    override val metadataColumns = Seq("payload_len")
    override val resultSchema = StructType(Seq(
      StructField("doubled", IntegerType)))
    override def processBatch(b: Seq[FilterInput]) =
      b.map { in =>
        val len = in.metadata("payload_len").asInstanceOf[Int]
        Some(Seq(len * 2))
      }
  }

  /** drops odd rows (return-none semantics) */
  private object DropOddFilter extends DataFilter {
    override val modalities = Seq(Modality.Image)
    override val resultSchema = StructType(Seq(
      StructField("kept", BooleanType)))
    override def processBatch(b: Seq[FilterInput]) =
      b.map { in =>
        if (in.payloads("image").length % 2 == 0) Some(Seq(true)) else None
      }
  }

  test("filter-needs-prior-filter-column dependency works") {
    val p2 = proc.applyDataFilter(SizeFilter).applyDataFilter(DoubledFilter)
    val rows = p2.df.select("payload_len", "doubled").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rows == Map(1 -> 2, 2 -> 4, 3 -> 6, 4 -> 8))
  }

  test("dropped rows null their result columns after the left merge") {
    val p = proc.applyDataFilter(DropOddFilter)
    val kept = p.df.select("image_path", "kept").collect()
      .map(r => r.getString(0).takeRight(5) -> Option(r.get(1))).toMap
    assert(kept("0.bin").isEmpty) // length 1 → dropped → null
    assert(kept("1.bin").contains(true)) // length 2 → kept
    assert(kept("2.bin").isEmpty)
    assert(kept("3.bin").contains(true))
  }

  test("requireComplete rejects a filter that dropped rows") {
    intercept[IllegalArgumentException] {
      proc.applyDataFilter(DropOddFilter, requireComplete = true)
    }
    // and accepts one that did not
    val ok = proc.applyDataFilter(SizeFilter, requireComplete = true)
    assert(ok.count() == 4)
  }

  test("readFiles supports parquet metadata tables") {
    val dir = Files.createTempDirectory("graft-pq").toFile
    Seq(("m/0.bin", "hello"), ("m/1.bin", "world"))
      .toDF("image_path", "caption")
      .coalesce(1).write.parquet(dir + "/meta")
    val cfg = FilesConfig(dir + "/meta", Seq(
      FilePayload(Modality.Image, "image_path"),
      ColumnPayload(Modality.Text, "caption")), format = "parquet")
    val p = DatasetReader.readFiles(spark, cfg)
    assert(p.count() == 2)
    assert(p.columns.contains("text"))
  }

  test("duplicate tar member names: first occurrence wins") {
    import org.apache.commons.compress.archivers.tar._
    val d = Files.createTempDirectory("graft-dup-tar").toFile
    val tarFile = new File(d, "0.tar")
    val tar = new TarArchiveOutputStream(new FileOutputStream(tarFile))
    for (content <- Seq("first", "second")) {
      val e = new TarArchiveEntry("x.txt")
      val b = content.getBytes("UTF-8")
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e); tar.write(b); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    val loader = new graft.sources.PayloadLoader(
      spark.sparkContext.hadoopConfiguration)
    val got = loader.loadTarMembers(tarFile.getAbsolutePath, Set("x.txt"))
    assert(new String(got("x.txt"), "UTF-8") == "first")
  }
}
