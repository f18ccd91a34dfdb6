package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.file.Files
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import graft.SparkSpec

/** Member-level split planning for the tar DataSource: byte-range
  * partitions over one large archive must yield exactly the same
  * member set as the partition-per-archive path, for ANY split size —
  * including boundaries that land inside a member's content, inside a
  * pax/long-name meta chain, or between header and payload.
  */
class TarSplitSpec extends SparkSpec {

  /** ~160 members with adversarial shapes: empty members, multi-block
    * payloads, >100-char names (pax chains under LONGFILE_POSIX), a
    * directory entry, and payload sizes straddling block boundaries.
    */
  private def writeCorpus(f: File, longMode: Int): Unit = {
    val out = new TarArchiveOutputStream(
      new BufferedOutputStream(new FileOutputStream(f)))
    out.setLongFileMode(longMode)
    out.setAddPaxHeadersForNonAsciiNames(true)
    val dir = new TarArchiveEntry("subdir/")
    out.putArchiveEntry(dir); out.closeArchiveEntry()
    (0 until 160).foreach { i =>
      val name =
        if (i % 7 == 0) s"deep/${"n" * 120}/member_$i.bin" // > 100 chars
        else s"member_$i.bin"
      val size = i match {
        case j if j % 11 == 0 => 0 // empty
        case j if j % 3 == 0 => 511 + j // just under/over block edges
        case j => 137 * j % 4096
      }
      val bytes = Array.tabulate[Byte](size)(k => ((i * 31 + k) % 251).toByte)
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.finish(); out.close()
  }

  private def fingerprint(dir: String, opts: Map[String, String])
      : Set[(String, Long, Int)] = {
    var r = spark.read.format("tar")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(dir).collect().map { row =>
      val c = row.getAs[Array[Byte]]("content")
      (row.getAs[String]("member"), row.getAs[Long]("size"),
        java.util.Arrays.hashCode(c))
    }.toSet
  }

  private lazy val paxDir: String = {
    val d = Files.createTempDirectory("graft-tar-split-pax").toFile
    writeCorpus(new File(d, "big.tar"), TarArchiveOutputStream.LONGFILE_POSIX)
    d.getAbsolutePath
  }

  private lazy val gnuDir: String = {
    val d = Files.createTempDirectory("graft-tar-split-gnu").toFile
    writeCorpus(new File(d, "big.tar"), TarArchiveOutputStream.LONGFILE_GNU)
    d.getAbsolutePath
  }

  test("range splits reproduce the unsplit member set at any split size") {
    val expected = fingerprint(paxDir, Map("split" -> "false"))
    assert(expected.size == 160)
    // Unaligned sizes on purpose: boundaries land mid-block, mid-chain,
    // mid-payload across the sweep.
    Seq(512L, 1000L, 1777L, 4096L, 65536L).foreach { sb =>
      val got = fingerprint(paxDir, Map("splitBytes" -> sb.toString))
      assert(got == expected, s"splitBytes=$sb diverged: " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    }
  }

  test("GNU long-name archives survive splitting too") {
    val expected = fingerprint(gnuDir, Map("split" -> "false"))
    Seq(1000L, 4096L).foreach { sb =>
      assert(fingerprint(gnuDir, Map("splitBytes" -> sb.toString)) == expected,
        s"splitBytes=$sb")
    }
  }

  test("a large archive actually fans out into many partitions") {
    val df = spark.read.format("tar").option("splitBytes", "4096").load(paxDir)
    assert(df.rdd.getNumPartitions > 10)
    val one = spark.read.format("tar").option("split", "false").load(paxDir)
    assert(one.rdd.getNumPartitions == 1)
  }

  test("pruned listing over splits matches full-read listing") {
    val listed = spark.read.format("tar").option("splitBytes", "2048")
      .load(paxDir).select("member", "size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    val full = fingerprint(paxDir, Map("split" -> "false"))
      .map { case (m, s, _) => (m, s) }
    assert(listed == full)
  }
}
