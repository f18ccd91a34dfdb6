package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.SparkException
import graft.SparkSpec

/** Error paths of the tar walker: truncated archives stop cleanly at
  * EOF (commons-compress semantics), empty files yield no rows, and
  * garbage where a header should be fails loudly with the corrupt
  * offset instead of emitting wrong rows.
  */
class TarErrorPathSpec extends SparkSpec {

  private def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    entries.foreach { case (n, b) =>
      val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e); tar.write(b); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    bos.toByteArray
  }

  private def writeFile(dir: File, name: String, bytes: Array[Byte]): File = {
    val f = new File(dir, name)
    val os = new FileOutputStream(f); os.write(bytes); os.close()
    f
  }

  private lazy val dir = Files.createTempDirectory("graft-tar-err").toFile

  test("a truncated archive stops at EOF without phantom rows") {
    val whole = tarBytes(Seq(
      "a.bin" -> Array.fill[Byte](600)(1),
      "b.bin" -> Array.fill[Byte](600)(2)))
    // cut inside b's content: only fully-readable members surface...
    val cut = writeFile(dir, "trunc.tar", whole.take(whole.length - 700))
    val rows = spark.read.format("tar").load(cut.getPath)
      .select("member").collect().map(_.getString(0)).toSet
    assert(rows.contains("a.bin"))
    assert(rows.size <= 2)
  }

  test("an empty file yields zero rows") {
    val f = writeFile(dir, "empty.tar", Array.emptyByteArray)
    assert(spark.read.format("tar").load(f.getPath).count() == 0)
  }

  test("garbage where a header should be fails loudly with the offset") {
    val good = tarBytes(Seq("a.bin" -> Array.fill[Byte](100)(7)))
    // strip the end-of-archive zero blocks, then append a full block
    // of garbage where the next header would be parsed
    val noTerm = good.dropWhile(_ => false).take(1024) // header + padded content
    val garbage = Array.fill[Byte](512)(0x55)
    val f = writeFile(dir, "corrupt.tar", noTerm ++ garbage)
    val e = intercept[SparkException] {
      spark.read.format("tar").load(f.getPath).count()
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("corrupt tar header"), msg.take(400))
  }
}
