package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, File, FileOutputStream}
import java.nio.file.Files
import scala.util.Random
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import graft.SparkSpec

/** Property sweep for the hand-rolled tar header walker: seeded
  * random archives (ascii/unicode/long names, sizes crossing every
  * block-boundary class, empty members, interleaved directories) must
  * read back IDENTICALLY to commons-compress — member names, sizes,
  * and content hashes — at every split size in a sweep of unaligned
  * values. commons-compress is the ground truth because the writers
  * (ShardWriters) produce archives with it.
  */
class TarSplitPropertySpec extends SparkSpec {

  private val rng = new Random(0xc0ffee)

  private def randomName(i: Int): String = {
    val pools = Seq(
      () => s"plain_$i.bin",
      () => s"dir_${i % 7}/nested_$i.dat",
      () => s"uni_éü中文_$i.bin", // pax-forced non-ascii
      () => s"long_${"x" * (90 + rng.nextInt(80))}_$i.bin") // straddles 100
    pools(rng.nextInt(pools.length))()
  }

  private def buildArchive(f: File, n: Int): Unit = {
    val out = new TarArchiveOutputStream(
      new BufferedOutputStream(new FileOutputStream(f)))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    out.setAddPaxHeadersForNonAsciiNames(true)
    (0 until n).foreach { i =>
      if (i % 13 == 0) {
        val d = new TarArchiveEntry(s"somedir_$i/")
        out.putArchiveEntry(d); out.closeArchiveEntry()
      }
      val size = rng.nextInt(4) match {
        case 0 => 0
        case 1 => rng.nextInt(64)
        case 2 => 512 * (1 + rng.nextInt(3)) + rng.nextInt(3) - 1
        case _ => rng.nextInt(9000)
      }
      val bytes = new Array[Byte](math.max(size, 0))
      rng.nextBytes(bytes)
      val e = new TarArchiveEntry(randomName(i))
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.finish(); out.close()
  }

  private def commonsTruth(f: File): Set[(String, Long, Int)] = {
    val in = new TarArchiveInputStream(
      new ByteArrayInputStream(Files.readAllBytes(f.toPath)))
    val out = Set.newBuilder[(String, Long, Int)]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val buf = new Array[Byte](e.getSize.toInt)
        var off = 0
        while (off < buf.length) {
          val r = in.read(buf, off, buf.length - off)
          require(r >= 0); off += r
        }
        out += ((e.getName, e.getSize, java.util.Arrays.hashCode(buf)))
      }
      e = in.getNextEntry
    }
    in.close()
    out.result()
  }

  test("seeded random archives read identically to commons-compress at every split") {
    val d = Files.createTempDirectory("graft-tar-prop").toFile
    (0 until 3).foreach { a =>
      val f = new File(d, s"rand_$a.tar")
      buildArchive(f, 120)
      val truth = commonsTruth(f)
      assert(truth.size == 120, s"archive $a ground truth")
      val unsplit = spark.read.format("tar").option("split", "false")
        .load(f.getPath).collect().map { r =>
          (r.getAs[String]("member"), r.getAs[Long]("size"),
            java.util.Arrays.hashCode(r.getAs[Array[Byte]]("content")))
        }.toSet
      assert(unsplit == truth, s"archive $a unsplit diverged: " +
        s"missing=${(truth -- unsplit).take(3)} extra=${(unsplit -- truth).take(3)}")
      Seq(700L, 1499L, 3072L, 16384L).foreach { sb =>
        val got = spark.read.format("tar").option("splitBytes", sb.toString)
          .load(f.getPath).collect().map { r =>
            (r.getAs[String]("member"), r.getAs[Long]("size"),
              java.util.Arrays.hashCode(r.getAs[Array[Byte]]("content")))
          }.toSet
        assert(got == truth, s"archive $a splitBytes=$sb diverged: " +
          s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
      }
    }
  }
}
