package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8
import graft.SparkSpec
import graft.sources.tar.TarFormat

/** Compatibility shapes commons-compress never writes, hand-built
  * byte by byte: POSIX ustar prefix-split names (python tarfile's
  * USTAR_FORMAT, star) and pax `size` records overriding the octal
  * header field (members past the 8 GiB octal limit). Getting either
  * wrong silently mangles names or desyncs the whole walk.
  */
class TarCompatSpec extends SparkSpec {

  private def block(fill: Array[Byte] => Unit): Array[Byte] = {
    val b = new Array[Byte](TarFormat.BlockSize)
    fill(b)
    b
  }

  /** POSIX ustar header with an optional prefix field and a chosen
    * octal size value.
    */
  private def ustarHeader(name: String, prefix: String, size: Long,
      flag: Char): Array[Byte] = block { b =>
    name.getBytes(UTF_8).copyToArray(b, 0)
    "0000644\u0000".getBytes(UTF_8).copyToArray(b, 100)
    "0000000\u0000".getBytes(UTF_8).copyToArray(b, 108) // uid
    "0000000\u0000".getBytes(UTF_8).copyToArray(b, 116) // gid
    ("%011o\u0000".format(size)).getBytes(UTF_8).copyToArray(b, 124)
    "00000000000\u0000".getBytes(UTF_8).copyToArray(b, 136) // mtime
    b(156) = flag.toByte
    "ustar\u000000".getBytes(UTF_8).copyToArray(b, 257)
    prefix.getBytes(UTF_8).copyToArray(b, 345)
    java.util.Arrays.fill(b, 148, 156, 0x20.toByte)
    val sum = b.map(_ & 0xff).sum
    ("%06o\u0000 ".format(sum)).getBytes(UTF_8).copyToArray(b, 148)
  }

  private def padTo512(bytes: Array[Byte]): Array[Byte] = {
    val padded = new Array[Byte](TarFormat.padded(bytes.length.toLong).toInt)
    bytes.copyToArray(padded)
    padded
  }

  private def writeArchive(name: String, parts: Array[Byte]*): String = {
    val d = Files.createTempDirectory("graft-tar-compat").toFile
    val f = new File(d, name)
    val os = new FileOutputStream(f)
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.write(new Array[Byte](1024)) // end-of-archive zero blocks
    os.write(out.toByteArray); os.close()
    f.getPath
  }

  test("ustar prefix-split names reassemble (python tarfile USTAR_FORMAT)") {
    val content = "hello".getBytes(UTF_8)
    val path = writeArchive("prefix.tar",
      ustarHeader("leaf.bin", "deeply/nested/dir", content.length.toLong, '0'),
      padTo512(content))
    val rows = spark.read.format("tar").load(path).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("member") == "deeply/nested/dir/leaf.bin")
    assert(new String(rows.head.getAs[Array[Byte]]("content"), UTF_8)
      == "hello")
  }

  test("pax size record overrides the octal header field and keeps sync") {
    // member A: octal size field LIES (0) — real size 5 in the pax
    // record; member B follows and must still be found
    val paxPayload =
      "30 mtime=1700000000.000000000\n10 size=5\n".getBytes(UTF_8)
    val contentA = "AAAAA".getBytes(UTF_8)
    val contentB = "BB".getBytes(UTF_8)
    val path = writeArchive("paxsize.tar",
      ustarHeader("PaxHeaders.0/a.bin", "", paxPayload.length.toLong, 'x'),
      padTo512(paxPayload),
      ustarHeader("a.bin", "", 0L, '0'), // octal field says 0!
      padTo512(contentA),
      ustarHeader("b.bin", "", contentB.length.toLong, '0'),
      padTo512(contentB))
    val rows = spark.read.format("tar").load(path).collect()
      .map(r => r.getAs[String]("member") ->
        new String(r.getAs[Array[Byte]]("content"), UTF_8)).toMap
    assert(rows == Map("a.bin" -> "AAAAA", "b.bin" -> "BB"),
      rows.toString)
  }

  test("pax GLOBAL header is skipped (not applied) and the walk stays in sync") {
    // a 'g' record carrying a path= default must NOT rename later
    // members on the splittable reader (documented divergence from
    // the .tgz streaming branch, which applies globals); the payload
    // must still be stepped over so following members read correctly
    val globalPayload = "21 path=ignored/dir/\n".getBytes(UTF_8)
    val content = "body".getBytes(UTF_8)
    val path = writeArchive("paxglobal.tar",
      ustarHeader("pax_global_header", "", globalPayload.length.toLong, 'g'),
      padTo512(globalPayload),
      ustarHeader("real.bin", "", content.length.toLong, '0'),
      padTo512(content))
    val rows = spark.read.format("tar").load(path).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("member") == "real.bin")
    assert(new String(rows.head.getAs[Array[Byte]]("content"), UTF_8)
      == "body")
  }

  test("contiguous-file entries (typeflag 7) surface like regular files") {
    val content = "contig".getBytes(UTF_8)
    val path = writeArchive("contig.tar",
      ustarHeader("c.bin", "", content.length.toLong, '7'),
      padTo512(content))
    val rows = spark.read.format("tar").load(path).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("member") == "c.bin")
    assert(rows.head.getAs[Long]("size") == 6L)
  }
}
