package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Within-member tar splitting: a member larger than the chunk size
  * must come back as multiple content-range rows, read on more than
  * one task, and reassemble byte-identically — the path that keeps a
  * multi-GB member from serializing through the single task that owns
  * its header (and from overflowing the 2 GiB row limit).
  */
class TarChunksSpec extends SparkSpec {

  private def writeTar(f: File, entries: Seq[(String, Array[Byte])]): Unit = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    tar.close()
    val os = new FileOutputStream(f)
    os.write(bos.toByteArray); os.close()
  }

  // deterministic non-repeating payload: any misplaced/duplicated
  // chunk changes the reassembled bytes
  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131 + i / 251) % 256).toByte)

  private val big = payload(5000) // ~10 chunks at 512
  private val small = "tiny".getBytes("UTF-8")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-tar-chunks").toFile
    writeTar(new File(d, "data.tar"),
      Seq("big.bin" -> big, "small.bin" -> small, "empty.bin" -> Array[Byte]()))
    d.getAbsolutePath
  }

  private def listing = spark.read.format("tar").load(dir)
    .select("archive", "member", "size", "offset")

  test("offset column points at each member's payload bytes") {
    // independently verify offsets with direct file reads
    val rows = listing.collect().map(r => r.getAs[String]("member") ->
      ((r.getAs[Long]("offset"), r.getAs[Long]("size")))).toMap
    val raw = Files.readAllBytes(
      new File(new File(dir), "data.tar").toPath)
    val (bigOff, bigSize) = rows("big.bin")
    assert(bigSize == big.length.toLong)
    assert(raw.slice(bigOff.toInt, bigOff.toInt + big.length).sameElements(big))
    val (smallOff, _) = rows("small.bin")
    assert(raw.slice(smallOff.toInt, smallOff.toInt + small.length)
      .sameElements(small))
  }

  test("a member larger than chunkBytes reads as chunks on >1 task") {
    val chunks = TarChunks.chunkedContent(listing, chunkBytes = 512L)
      .withColumn("task", spark_partition_id())
    val bigRows = chunks.filter(col("member") === "big.bin").collect()
    assert(bigRows.length == 10, s"expected ⌈5000/512⌉ = 10 chunks")
    // chunk offsets tile the member exactly
    val offs = bigRows.map(_.getAs[Long]("chunk_offset")).sorted
    assert(offs.sameElements((0 until 10).map(_ * 512L)))
    // each chunk carries its slice
    bigRows.foreach { r =>
      val off = r.getAs[Long]("chunk_offset").toInt
      val want = big.slice(off, math.min(off + 512, big.length))
      assert(r.getAs[Array[Byte]]("content").sameElements(want),
        s"chunk at $off differs")
    }
    // the whole point: one member's bytes land on multiple tasks
    val tasks = bigRows.map(_.getAs[Int]("task")).distinct
    assert(tasks.length > 1,
      s"all 10 chunks read on one task ($tasks) — not distributed")
  }

  test("reassemble restores byte-identical members, including empty ones") {
    val chunks = TarChunks.chunkedContent(listing, chunkBytes = 512L)
    val back = TarChunks.reassemble(chunks).collect()
      .map(r => r.getAs[String]("member") ->
        r.getAs[Array[Byte]]("content")).toMap
    assert(back("big.bin").sameElements(big))
    assert(back("small.bin").sameElements(small))
    assert(back("empty.bin").isEmpty)
    // zero-byte member still surfaced as exactly one chunk row
    assert(chunks.filter(col("member") === "empty.bin").count() == 1L)
  }

  test("hugeMemberMode=chunks: mixed archive in ONE scan — small " +
      "members whole, huge member as content-range rows") {
    val df = spark.read.format("tar")
      .option("hugeMemberMode", "chunks").option("chunkBytes", "512")
      .load(dir)
    val rows = df.collect()
    val bigRows = rows.filter(_.getAs[String]("member") == "big.bin")
    assert(bigRows.length == 10, s"expected ⌈5000/512⌉ = 10 chunk rows")
    // rows are self-describing: offset absolute in the archive, size
    // per-row; offset order reassembles byte-identically
    val reassembled = bigRows.sortBy(_.getAs[Long]("offset"))
      .flatMap(_.getAs[Array[Byte]]("content"))
    assert(reassembled.sameElements(big))
    assert(bigRows.map(_.getAs[Long]("size")).sum == big.length.toLong)
    assert(bigRows.forall(r =>
      r.getAs[Array[Byte]]("content").length.toLong ==
        r.getAs[Long]("size")))
    // small and empty members stay one whole row each
    val smallRows = rows.filter(_.getAs[String]("member") == "small.bin")
    assert(smallRows.length == 1 &&
      smallRows.head.getAs[Array[Byte]]("content").sameElements(small))
    val emptyRows = rows.filter(_.getAs[String]("member") == "empty.bin")
    assert(emptyRows.length == 1 &&
      emptyRows.head.getAs[Long]("size") == 0L)
    // a pruned (no-content) scan emits the SAME chunk rows as
    // descriptor-only rows — multiplicity must not depend on which
    // columns survive pruning (else count() and collect() disagree)
    val pruned = spark.read.format("tar")
      .option("hugeMemberMode", "chunks").option("chunkBytes", "512")
      .load(dir).select("member", "size").collect()
    assert(pruned.length == rows.length,
      s"pruned row count ${pruned.length} != content scan ${rows.length}")
    assert(pruned.filter(_.getString(0) == "big.bin")
      .map(_.getLong(1)).sum == big.length.toLong)
    // and the default mode stays one-member-one-row
    assert(spark.read.format("tar").load(dir).count() == 3L)
  }

  test("readShardMembers: the ShardsConfig knob drives the chunked " +
      "mixed-archive scan — no reader options at the call site") {
    import graft.core.{Modality, ShardedPayload, ShardsConfig}
    // a proper shards layout: N.csv + N.tar pair (readShardMembers
    // enforces the same pairing contract as the metadata path)
    val d = Files.createTempDirectory("graft-shard-members").toFile
    writeTar(new File(d, "0.tar"),
      Seq("big.bin" -> big, "small.bin" -> small))
    val csv = new FileOutputStream(new File(d, "0.csv"))
    csv.write("image_name,caption\nbig.bin,a\nsmall.bin,b\n".getBytes("UTF-8"))
    csv.close()
    val cfg = ShardsConfig(d.getAbsolutePath,
      Seq(ShardedPayload(Modality.Image, "image_name")),
      hugeMemberMode = "chunks", chunkBytes = Some(512L))
    val rows = DatasetReader.readShardMembers(spark, cfg).collect()
    val bigRows = rows.filter(_.getAs[String]("member") == "big.bin")
    assert(bigRows.length == 10, s"got ${bigRows.length} chunk rows")
    assert(bigRows.sortBy(_.getAs[Long]("offset"))
      .flatMap(_.getAs[Array[Byte]]("content")).sameElements(big))
    assert(rows.count(_.getAs[String]("member") == "small.bin") == 1)
    // a config asking for the default strict mode keeps
    // one-member-one-row on the same layout
    val strict = cfg.copy(hugeMemberMode = "error", chunkBytes = None)
    assert(DatasetReader.readShardMembers(spark, strict).count() == 2L)
    // a non-tar-family archivesExt would pair fine and then scan
    // ZERO files silently — must reject up front
    val e1 = intercept[IllegalArgumentException] {
      DatasetReader.readShardMembers(spark, cfg.copy(archivesExt = "zip"))
    }
    assert(e1.getMessage.contains("tar-family"), e1.getMessage)
    // an unpaired archive fails the config path at plan time —
    // the shards pairing contract holds for the member scan too
    writeTar(new File(d, "1.tar"), Seq("x.bin" -> small))
    val e2 = intercept[IllegalArgumentException] {
      DatasetReader.readShardMembers(spark, cfg)
    }
    assert(e2.getMessage.contains("unpaired"), e2.getMessage)
  }

  test("gzip archives are rejected with a pointer at the streaming source") {
    val d = Files.createTempDirectory("graft-tar-chunks-gz").toFile
    // fake listing row — the reject fires before any byte is read
    import spark.implicits._
    val fake = Seq((new File(d, "x.tar.gz").getPath, "m.bin", 4L, 512L))
      .toDF("archive", "member", "size", "offset")
    val ex = intercept[org.apache.spark.SparkException] {
      TarChunks.chunkedContent(fake, 512L).collect()
    }
    assert(ex.getMessage.contains("gzip") ||
      ex.getCause != null && ex.getCause.getMessage.contains("gzip"))
  }
}
