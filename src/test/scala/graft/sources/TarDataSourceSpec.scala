package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.file.Files
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TarDataSourceSpec extends SparkSpec {

  private def writeTar(f: File, entries: Seq[(String, Array[Byte])]): Unit = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    entries.foreach { case (n, b) =>
      val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e); tar.write(b); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    val os = new FileOutputStream(f)
    os.write(bos.toByteArray); os.close()
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-tar-ds").toFile
    writeTar(new File(d, "0.tar"), Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "b.txt" -> "beta-longer".getBytes("UTF-8")))
    writeTar(new File(d, "1.tar"), Seq(
      "c.txt" -> "gamma".getBytes("UTF-8")))
    d.getAbsolutePath
  }

  test("reads one row per member across archives") {
    val df = spark.read.format("tar").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("archive", "member", "size", "offset", "content"))
    val rows = df.collect()
    assert(rows.length == 3)
    val byMember = rows.map(r =>
      r.getAs[String]("member") -> r).toMap
    assert(new String(byMember("a.txt").getAs[Array[Byte]]("content"),
      "UTF-8") == "alpha")
    assert(byMember("b.txt").getAs[Long]("size") == 11L)
    assert(byMember("c.txt").getAs[String]("archive").endsWith("1.tar"))
  }

  test("one input partition per archive") {
    val df = spark.read.format("tar").load(dir)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the reader (content skipped)") {
    val df = spark.read.format("tar").load(dir).select("member", "size")
    // the scan description reflects the pruned column set
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("content"), scan.take(1500))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a.txt" -> 5L, "b.txt" -> 11L, "c.txt" -> 5L))
  }

  test("single-archive path and SQL usage") {
    val df = spark.read.format("tar").load(s"$dir/0.tar")
    assert(df.count() == 2)
    df.createOrReplaceTempView("tar_members")
    val n = spark.sql(
      "SELECT count(*) FROM tar_members WHERE size > 5").collect()
      .head.getLong(0)
    assert(n == 1L)
  }
}
