package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.ImageIO
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core._
import graft.operators._

/** End-to-end dataset IO: mirrors the reference's fixture suites
  * (tests/test_readers.py, test_writers.py, test_validators.py,
  * test_image_filters.py, test_pipelines.py) on generated fixtures —
  * 2-shard image+caption datasets in files / shards / sharded-files
  * layouts, including deliberately-broken variants. */
class DatasetIOSpec extends SparkSpec {

  // ---------- fixture generation ----------

  private lazy val root: File = {
    val d = Files.createTempDirectory("graft-fixtures").toFile
    d.deleteOnExit()
    d
  }

  private def pngBytes(seed: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 77777) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def writeFile(f: File, bytes: Array[Byte]): Unit = {
    f.getParentFile.mkdirs()
    val o = new FileOutputStream(f)
    try o.write(bytes) finally o.close()
  }

  /** files layout: data.csv + img/NN.png; row 3 duplicates row 0's
    * image bytes (phash dedup target), row 4 is corrupt. */
  private lazy val filesDir: File = {
    val d = new File(root, "files_correct")
    val rows = (0 until 5).map { i =>
      val name = f"$i%02d.png"
      val bytes =
        if (i == 3) pngBytes(0)
        else if (i == 4) Array[Byte](1, 2, 3, 4)
        else pngBytes(i)
      writeFile(new File(d, s"img/$name"), bytes)
      s"img/$name,caption number $i"
    }
    writeFile(new File(d, "data.csv"),
      ("image_path,caption" +: rows).mkString("\n").getBytes("UTF-8"))
    d
  }

  private def tarOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    entries.foreach { case (n, b) =>
      val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(b)
      tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    bos.toByteArray
  }

  /** shards layout: 0.csv+0.tar (3 rows), 1.csv+1.tar (2 rows). */
  private lazy val shardsDir: File = {
    val d = new File(root, "shards_correct")
    d.mkdirs()
    val shards = Seq(0 -> Seq(0, 1, 2), 1 -> Seq(3, 4))
    shards.foreach { case (s, ids) =>
      val entries = ids.map(i => (f"$i%02d.png", pngBytes(i)))
      writeFile(new File(d, s"$s.tar"), tarOf(entries))
      val rows = ids.map(i => f"$i%02d.png,caption number $i")
      writeFile(new File(d, s"$s.csv"),
        ("image_name,caption" +: rows).mkString("\n").getBytes("UTF-8"))
    }
    d
  }

  /** sharded-files layout: 0.csv + 0/ etc. */
  private lazy val shardedFilesDir: File = {
    val d = new File(root, "sharded_files_correct")
    d.mkdirs()
    val shards = Seq(0 -> Seq(0, 1, 2), 1 -> Seq(3, 4))
    shards.foreach { case (s, ids) =>
      ids.foreach(i =>
        writeFile(new File(d, f"$s/$i%02d.png"), pngBytes(i)))
      val rows = ids.map(i => f"$i%02d.png,caption number $i")
      writeFile(new File(d, s"$s.csv"),
        ("image_name,caption" +: rows).mkString("\n").getBytes("UTF-8"))
    }
    d
  }

  private def filesConfig = DatasetConfig.filesImageText(
    new File(filesDir, "data.csv").getAbsolutePath)
  private def shardsConfig = DatasetConfig.shardsImageText(
    shardsDir.getAbsolutePath)
  private def shardedFilesConfig = DatasetConfig.shardedFilesImageText(
    shardedFilesDir.getAbsolutePath)

  // ---------- readers (test_readers.py analog) ----------

  test("readFiles: canonical columns, resolved paths, row count") {
    val p = DatasetReader.readFiles(spark, filesConfig)
    assert(p.count() == 5)
    assert(p.columns.take(2) == Seq("image_path", "text"))
    val paths = p.df.select("image_path").collect().map(_.getString(0))
    assert(paths.forall(_.startsWith("/")), "paths must be absolute")
  }

  test("readFiles jsonl: line-delimited metadata reads like csv") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("data.jsonl")
    java.nio.file.Files.writeString(f,
      """{"image_path": "imgs/a.png", "caption": "first one"}
        |{"image_path": "/abs/b.png", "caption": "second"}
        |""".stripMargin)
    val p = DatasetReader.readFiles(spark, graft.core.FilesConfig(
      f.toString,
      Seq(graft.core.FilePayload(graft.core.Modality.Image, "image_path"),
        graft.core.ColumnPayload(graft.core.Modality.Text, "caption")),
      format = "jsonl"))
    assert(p.count() == 2)
    assert(p.columns.take(2) == Seq("image_path", "text"))
    val rows = p.df.select("image_path", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    assert(rows(0)._1 == s"$dir/imgs/a.png") // relative → table dir
    assert(rows(1)._1 == "/abs/b.png")       // absolute kept
    assert(rows.map(_._2).toSeq == Seq("first one", "second"))
  }

  test("saveMetadata jsonl roundtrip preserves null fields") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-w")
    val out = s"$dir/meta"
    val cfg = graft.core.FilesConfig("/unused",
      Seq(graft.core.ColumnPayload(graft.core.Modality.Text, "text")))
    val df = Seq((1L, Some("kept")), (2L, None), (3L, None))
      .toDF("doc_id", "text")
    ShardWriters.saveMetadata(
      DatasetReader.fromDataFrame(df, cfg), out, format = "jsonl")
    val back = spark.read.json(out)
    assert(back.columns.toSet == Set("doc_id", "text"),
      "all-null-in-split column must survive the roundtrip")
    assert(back.count() == 3)
    assert(back.filter(col("text").isNull).count() == 2)
  }

  test("readShards: split_name + member paths + all rows") {
    val p = DatasetReader.readShards(spark, shardsConfig)
    assert(p.count() == 5)
    assert(p.columns.contains("split_name"))
    val splits = p.df.select("split_name").distinct()
      .collect().map(_.getString(0)).sorted
    assert(splits.sameElements(Array("0", "1")))
    val path = p.df.filter(col("image_name") === "03.png")
      .select("image_path").collect().head.getString(0)
    assert(path.endsWith("1.tar!03.png"), path)
  }

  test("readShardedFiles: member paths point into shard dirs") {
    val p = DatasetReader.readShardedFiles(spark, shardedFilesConfig)
    assert(p.count() == 5)
    val path = p.df.filter(col("image_name") === "00.png")
      .select("image_path").collect().head.getString(0)
    assert(path.endsWith("/0/00.png"), path)
  }

  test("readShards rejects unpaired shards") {
    val d = new File(root, "shards_wrong_tar")
    d.mkdirs()
    writeFile(new File(d, "0.csv"),
      "image_name,caption\na.png,x".getBytes("UTF-8"))
    // no 0.tar
    val cfg = DatasetConfig.shardsImageText(d.getAbsolutePath)
    intercept[IllegalArgumentException] {
      DatasetReader.readShards(spark, cfg)
    }
  }

  test("readShards rejects disagreeing shard columns unless disabled") {
    val d = new File(root, "shards_wrong_columns")
    d.mkdirs()
    writeFile(new File(d, "0.csv"),
      "image_name,caption\na.png,x".getBytes("UTF-8"))
    writeFile(new File(d, "0.tar"), tarOf(Seq("a.png" -> pngBytes(1))))
    writeFile(new File(d, "1.csv"),
      "image_name,other\nb.png,y".getBytes("UTF-8"))
    writeFile(new File(d, "1.tar"), tarOf(Seq("b.png" -> pngBytes(2))))
    val cfg = DatasetConfig.shardsImageText(d.getAbsolutePath)
    intercept[IllegalArgumentException] {
      DatasetReader.readShards(spark, cfg)
    }
    // validate_columns=False path succeeds (test_readers.py:30-47)
    val p = DatasetReader.readShards(spark, cfg, validateColumns = false)
    assert(p.count() == 2)
  }

  // ---------- data filters (test_image_filters.py analog) ----------

  test("ImageInfoFilter over files layout: dims + corrupt-row error") {
    val p = DatasetReader.readFiles(spark, filesConfig)
      .applyDataFilter(ImageInfoFilter())
    val rows = p.df.select("image_path", "is_correct", "width", "height")
      .collect()
    assert(rows.length == 5)
    val good = rows.filter(_.getBoolean(1))
    assert(good.length == 4)
    assert(good.forall(r => r.getInt(2) == 32 && r.getInt(3) == 24))
    val bad = rows.filterNot(_.getBoolean(1))
    assert(bad.length == 1)
  }

  test("ImageInfoFilter over shards layout reads tar members") {
    val p = DatasetReader.readShards(spark, shardsConfig)
      .applyDataFilter(ImageInfoFilter())
    val ok = p.df.filter(col("is_correct")).count()
    assert(ok == 5)
  }

  test("PHashFilter: identical images share a hash, distinct differ") {
    val p = DatasetReader.readFiles(spark, filesConfig)
      .applyDataFilter(PHashFilter(8))
    val hashes = p.df
      .select(element_at(split(col("image_path"), "/"), -1), col("image_phash_8"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hashes("00.png") != null)
    assert(hashes("00.png") == hashes("03.png"), "duplicate images must collide")
    assert(hashes("00.png") != hashes("01.png"))
    assert(hashes("04.png") == null, "corrupt image yields null hash")
    assert(hashes("00.png").length == 16) // 64 bits as hex
  }

  test("phash-dedup slice: the reference demo end-to-end (SURVEY §7.2)") {
    val p = DatasetReader.readShards(spark, shardsConfig)
      .applyDataFilter(ImageInfoFilter())
      .applyDataFilter(PHashFilter(8))
    val deduped = p.dedup(Seq("image_phash_8"),
      orderBy = Seq(col("image_name")))
    assert(deduped.count() == 5) // all shard images distinct
  }

  // ---------- column filters ----------

  test("column filters add expression columns") {
    val p = DatasetReader.readFiles(spark, filesConfig)
      .applyColumnFilter(LangIdFilter())
      .applyColumnFilter(TextQualityFilter())
      .applyColumnFilter(RegexCleanFilter())
    assert(Seq("lang", "lang_score", "n_tokens", "quality_score",
      "clean_caption").forall(p.columns.contains))
    val r = p.df.select("n_tokens", "clean_caption").collect()
    assert(r.forall(_.getLong(0) == 3L))
  }

  test("RegexCleanFilter strips html/urls and collapses punctuation") {
    import spark.implicits._
    val df = Seq("Visit <b>our</b> site https://x.example NOW!!!")
      .toDF("text")
    val p = Processor(df, filesConfig).applyColumnFilter(RegexCleanFilter())
    assert(p.df.select("clean_caption").collect().head.getString(0)
      == "visit our site now!")
  }

  // ---------- processor ops ----------

  test("rename/drop guards mirror the reference") {
    val p = DatasetReader.readFiles(spark, filesConfig)
    intercept[IllegalArgumentException](p.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](p.renameColumn("caption", "text"))
    intercept[IllegalArgumentException](p.dropColumn("image_path"))
    val renamed = p.withColumnSet("extra", lit(1)).renameColumn("extra", "e2")
    assert(renamed.columns.contains("e2"))
    assert(renamed.dropColumn("e2").columns == p.columns)
  }

  test("mergeResult rejects duplicate result keys") {
    import spark.implicits._
    val p = DatasetReader.readFiles(spark, filesConfig)
    val dup = Seq(("a", 1), ("a", 2)).toDF("image_path", "v")
    intercept[IllegalArgumentException](p.mergeResult(dup, "image_path"))
  }

  test("summary and seeded sample/shuffle are usable") {
    val p = DatasetReader.readFiles(spark, filesConfig)
      .withColumnSet("len", length(col("text")))
    val s = p.summary(Seq("len"))
    assert(s.count() == 8)
    assert(p.randomSample(2, seed = 7).count() == 2)
    assert(p.shuffle(seed = 7).count() == 5)
  }

  // ---------- pipeline (test_pipelines.py analog) ----------

  test("pipeline runs stages, skips existing columns, honors onError") {
    val p = DatasetReader.readFiles(spark, filesConfig)
    val stages = Seq(
      Pipeline.columnFilterStage(LangIdFilter()),
      Pipeline.columnFilterStage(LangIdFilter()), // skipped (cols exist)
      Pipeline.transformStage("boom",
        _ => throw new RuntimeException("boom"),
      ),
      Pipeline.filterStage("keep-all", lit(true)))
    val res = Pipeline.run(p, stages.map(s =>
      if (s.name == "boom") s.copy(onError = Pipeline.ContinueOnError) else s))
    assert(res.ran == Seq("LangIdFilter", "keep-all"))
    assert(res.skipped == Seq("LangIdFilter"))
    assert(res.failed.map(_._1) == Seq("boom"))

    val stopped = Pipeline.run(p, stages)
    assert(stopped.failed.map(_._1) == Seq("boom"))
    assert(stopped.ran == Seq("LangIdFilter"))
  }

  // ---------- writers + validators (test_writers.py round-trip) ----------

  test("saveToShards → readShards → validate: zero errors") {
    val src = DatasetReader.readFiles(spark, filesConfig)
      .filterRows(col("image_path").rlike("0[0-3]\\.png$")) // drop corrupt row
    val out = new File(root, "out_shards").getAbsolutePath
    val cfg = ShardWriters.saveToShards(src, out, maxFilesInShard = 2)
    val back = DatasetReader.readShards(spark, cfg)
    assert(back.count() == 4)
    assert(back.df.select("text").collect().map(_.getString(0)).sorted.toSeq
      == (0 to 3).map(i => s"caption number $i"))
    val vr = Validators.validate(back)
    assert(vr.isValid, vr.errors.map(_.describe).mkString("; "))
    // payloads survived the copy
    val info = back.applyDataFilter(ImageInfoFilter())
    assert(info.df.filter(col("is_correct")).count() == 4)
  }

  test("saveToShardedFiles → readShardedFiles → validate: zero errors") {
    val src = DatasetReader.readShards(spark, shardsConfig)
    val out = new File(root, "out_sharded_files").getAbsolutePath
    val cfg = ShardWriters.saveToShardedFiles(src, out, maxFilesInShard = 3)
    val back = DatasetReader.readShardedFiles(spark, cfg)
    assert(back.count() == 5)
    val vr = Validators.validate(back)
    assert(vr.isValid, vr.errors.map(_.describe).mkString("; "))
  }

  test("validators catch duplicates, missing members, extra members") {
    val d = new File(root, "shards_bad")
    d.mkdirs()
    // table says a.png+b.png; tar has a.png+c.png; b missing, c extra;
    // plus a duplicated key row
    writeFile(new File(d, "0.csv"),
      "image_name,caption\na.png,x\nb.png,y\na.png,z".getBytes("UTF-8"))
    writeFile(new File(d, "0.tar"),
      tarOf(Seq("a.png" -> pngBytes(1), "c.png" -> pngBytes(2))))
    val p = DatasetReader.readShards(
      spark, DatasetConfig.shardsImageText(d.getAbsolutePath))
    val vr = Validators.validate(p)
    assert(!vr.isValid)
    val kinds = vr.errors.map(_.getClass.getSimpleName).toSet
    assert(kinds.contains("DuplicatedValuesError"), kinds)
    assert(kinds.contains("NoSuchFileError"), kinds)
    assert(kinds.contains("FileNotInDataError"), kinds)
  }

  // ---------- media probes ----------

  test("VideoInfoFilter parses a minimal AVI header and rejects junk") {
    val f = VideoInfoFilter()
    // hand-built RIFF/AVI: avih with 100 frames 320x240, strh vids 30/1
    val bos = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(0); tag("AVI ")
    tag("avih"); w32(56)
    w32(33333) // usec/frame
    w32(0); w32(0); w32(0)
    w32(100) // total frames
    w32(0); w32(1); w32(0)
    w32(320); w32(240)
    bos.write(new Array[Byte](16))
    tag("strh"); w32(56)
    tag("vids"); tag("none")
    w32(0); w32(0); w32(0)
    w32(1) // scale
    w32(30) // rate
    bos.write(new Array[Byte](24))
    val avi = bos.toByteArray
    val res = f.probeAvi(avi)
    assert(res == Seq(true, 320, 240, 30.0, 100 / 30.0, null))
    val bad = f.probeAvi(Array[Byte](1, 2, 3))
    assert(bad.head == false)
  }

  test("VideoInfoFilter parses a minimal MP4 box tree") {
    // hand-built ISO-BMFF: mvhd 5 s movie, one video trak 640x360,
    // mdhd timescale 600 dur 3000 (5 s), stts 150 samples -> 30 fps
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(body.length + 8) ++ typ.getBytes("US-ASCII") ++ body
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    val mvhd = box("mvhd", new Array[Byte](12), // v0 + creation + mod
      be32(1000), be32(5000), new Array[Byte](80))
    val tkhd = box("tkhd", new Array[Byte](76),
      be32(640L << 16), be32(360L << 16))
    val mdhd = box("mdhd", new Array[Byte](12),
      be32(600), be32(3000), be32(0))
    val hdlr = box("hdlr", new Array[Byte](8), "vide".getBytes,
      new Array[Byte](12))
    val stts = box("stts", be32(0), be32(1), be32(150), be32(20))
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mp4 = ftyp ++ moov
    val res = VideoInfoFilter().processBatch(Seq(FilterInput("k",
      Map(Modality.Video.name -> mp4), Map.empty))).head.get
    assert(res == Seq(true, 640, 360, 30.0, 5.0, null), res)
    // audio-only mp4 (no vide handler) is not a video
    val soun = box("moov", mvhd, box("trak", tkhd,
      box("mdia", mdhd, box("hdlr", new Array[Byte](8),
        "soun".getBytes, new Array[Byte](12)))))
    val bad = VideoInfoFilter().processBatch(Seq(FilterInput("k",
      Map(Modality.Video.name -> (ftyp ++ soun)), Map.empty))).head.get
    assert(bad.head == false && bad.last == "no video trak", bad)
  }

  test("AudioInfoFilter probes a generated WAV") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val samples = new Array[Byte](16000 * 2) // 1 second of silence
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 16000)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val res = AudioInfoFilter().processBatch(Seq(FilterInput(
      "k", Map("audio" -> bos.toByteArray), Map.empty))).head.get
    assert(res(0) == true)
    assert(res(1).asInstanceOf[Double] == 1.0)
    assert(res(2) == 16000)
  }

  test("AudioStatsFilter: RMS/peak/clipping on known PCM signals") {
    import javax.sound.sampled._
    def wav16(pcm: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](pcm.length * 2)
      pcm.indices.foreach { i =>
        bytes(2 * i) = (pcm(i) & 0xff).toByte
        bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, pcm.length)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def stats(bytes: Array[Byte]): Seq[Any] =
      AudioStatsFilter().processBatch(Seq(FilterInput(
        "k", Map("audio" -> bytes), Map.empty))).head.get
    // half-scale square wave: rms = peak = 0.5, nothing clipped
    val half = stats(wav16(Array.fill(1000)(16384.toShort)
      .zipWithIndex.map { case (v, i) =>
        (if (i % 2 == 0) v else (-v).toShort): Short }))
    assert(math.abs(half(0).asInstanceOf[Double] - 0.5) < 1e-9)
    assert(math.abs(half(1).asInstanceOf[Double] - 0.5) < 1e-9)
    assert(half(2).asInstanceOf[Double] == 0.0)
    assert(half(3) == 1000L)
    // rail-pinned signal: |−32768|/32768 = 1.0 → fully clipped
    val rail = stats(wav16(Array.fill(100)(Short.MinValue)))
    assert(rail(0).asInstanceOf[Double] == 1.0)
    assert(rail(1).asInstanceOf[Double] == 1.0)
    assert(rail(2).asInstanceOf[Double] == 1.0)
    // silence: all zeros
    val silent = stats(wav16(new Array[Short](500)))
    assert(silent(0) == 0.0 && silent(1) == 0.0 && silent(2) == 0.0)
    // undecodable bytes → all-null row, not a task failure
    assert(stats(Array[Byte](1, 2, 3)).forall(_ == null))
    // 8-bit unsigned at the positive rail: 255 normalizes to only
    // 127/128 ≈ 0.992, so clipping must key on the integer rail
    def wav8(pcm: Array[Int]): Array[Byte] = {
      val bytes = pcm.map(_.toByte)
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, pcm.length)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val hot8 = stats(wav8(Array.fill(64)(255)))
    assert(hot8(2).asInstanceOf[Double] == 1.0, s"8-bit rail: $hot8")
    assert(math.abs(hot8(1).asInstanceOf[Double] - 127.0 / 128) < 1e-12)
    val mid8 = stats(wav8(Array.fill(64)(192))) // +0.5, no rail
    assert(mid8(2).asInstanceOf[Double] == 0.0)
    assert(math.abs(mid8(0).asInstanceOf[Double] - 0.5) < 1e-12)
  }
}
