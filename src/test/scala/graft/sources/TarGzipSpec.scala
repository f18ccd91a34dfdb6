package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import graft.SparkSpec

/** Gzip-compressed shard archives stream whole (no preads through
  * gzip): same rows as the plain source, one partition per archive
  * even when the file would otherwise split, and mixed plain/.tgz
  * directories read together.
  */
class TarGzipSpec extends SparkSpec {

  private def writeTar(f: File, gz: Boolean,
      entries: Seq[(String, Array[Byte])]): Unit = {
    val raw = new FileOutputStream(f)
    val sink = if (gz) new GZIPOutputStream(raw) else raw
    val tar = new TarArchiveOutputStream(new BufferedOutputStream(sink))
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    entries.foreach { case (n, b) =>
      val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e); tar.write(b); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
  }

  private def fp(dir: String): Set[(String, Long, Int)] =
    spark.read.format("tar").load(dir).collect().map { r =>
      (r.getAs[String]("member"), r.getAs[Long]("size"),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]]("content")))
    }.toSet

  private val entries = (0 until 40).map { i =>
    s"m_$i.bin" -> Array.tabulate[Byte](137 * i % 3000)(k =>
      ((i + k) % 251).toByte)
  }

  test("tgz rows equal plain-tar rows") {
    val dp = Files.createTempDirectory("graft-tgz-plain").toFile
    val dz = Files.createTempDirectory("graft-tgz-gz").toFile
    writeTar(new File(dp, "0.tar"), gz = false, entries)
    writeTar(new File(dz, "0.tar.gz"), gz = true, entries)
    assert(fp(dz.getPath) == fp(dp.getPath))
  }

  test("compressed archives never split, even under a tiny splitBytes") {
    val d = Files.createTempDirectory("graft-tgz-nosplit").toFile
    writeTar(new File(d, "big.tgz"), gz = true, entries)
    val df = spark.read.format("tar").option("splitBytes", "2048")
      .load(d.getPath)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == entries.length.toLong)
  }

  test("hugeMemberMode=chunks works on gzip streams: sequential " +
      "chunk rows reassemble byte-identically") {
    val d = Files.createTempDirectory("graft-tgz-chunks").toFile
    val big = Array.tabulate[Byte](5000)(k => ((k * 131) % 251).toByte)
    writeTar(new File(d, "0.tar.gz"), gz = true,
      Seq("big.bin" -> big, "small.bin" -> Array[Byte](1, 2, 3)))
    val rows = spark.read.format("tar")
      .option("hugeMemberMode", "chunks").option("chunkBytes", "512")
      .load(d.getPath).collect()
    val bigRows = rows.filter(_.getAs[String]("member") == "big.bin")
    assert(bigRows.length == 10, s"expected 10 chunk rows")
    val reassembled = bigRows.sortBy(_.getAs[Long]("offset"))
      .flatMap(_.getAs[Array[Byte]]("content"))
    assert(reassembled.sameElements(big))
    assert(bigRows.map(_.getAs[Long]("size")).sum == big.length.toLong)
    val smallRows = rows.filter(_.getAs[String]("member") == "small.bin")
    assert(smallRows.length == 1 &&
      smallRows.head.getAs[Array[Byte]]("content")
        .sameElements(Array[Byte](1, 2, 3)))
  }

  test("mixed plain and compressed shard directories read together") {
    val d = Files.createTempDirectory("graft-tgz-mixed").toFile
    writeTar(new File(d, "0.tar"), gz = false, entries.take(10))
    writeTar(new File(d, "1.tar.gz"), gz = true, entries.slice(10, 25))
    writeTar(new File(d, "2.tgz"), gz = true, entries.drop(25))
    val df = spark.read.format("tar").load(d.getPath)
    assert(df.count() == entries.length.toLong)
    assert(df.rdd.getNumPartitions == 3)
  }
}
