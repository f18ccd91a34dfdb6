package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TarChunks

/** Dev probe for within-member tar splitting: writes one archive
  * holding a single `memberMb`-MiB member plus small siblings, then
  * times (a) the whole-member DSv2 read (single task owns all bytes)
  * vs (b) the chunked metadata→pread path, and reports how many
  * tasks actually carried bytes. Usage:
  * `graft.TarChunksProbe [memberMb] [chunkMb]`. */
object TarChunksProbe {
  def main(args: Array[String]): Unit = {
    val memberMb = args.headOption.map(_.toInt).getOrElse(512)
    val chunkMb = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .appName("tar-chunks-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-tarchunks-probe").toFile
    val tarPath = new java.io.File(dir, "big.tar")
    // hand-rolled tar: one huge member + 8 small ones
    val os = new BufferedOutputStream(new FileOutputStream(tarPath), 1 << 20)
    def header(name: String, size: Long): Array[Byte] = {
      val b = new Array[Byte](512)
      name.getBytes("UTF-8").copyToArray(b, 0)
      "0000644\u0000".getBytes.copyToArray(b, 100)
      "0000000\u0000".getBytes.copyToArray(b, 108)
      "0000000\u0000".getBytes.copyToArray(b, 116)
      ("%011o\u0000".format(size)).getBytes.copyToArray(b, 124)
      "00000000000\u0000".getBytes.copyToArray(b, 136)
      b(156) = '0'
      "ustar\u000000".getBytes.copyToArray(b, 257)
      java.util.Arrays.fill(b, 148, 156, 0x20.toByte)
      val sum = b.map(_ & 0xff).sum
      ("%06o\u0000 ".format(sum)).getBytes.copyToArray(b, 148)
      b
    }
    val big = memberMb.toLong * 1024 * 1024
    os.write(header("big.bin", big))
    val block = new Array[Byte](1 << 20)
    (0 until memberMb).foreach { i =>
      java.util.Arrays.fill(block, (i % 251).toByte)
      os.write(block)
    }
    (0 until 8).foreach { i =>
      val payload = s"small member $i".getBytes
      os.write(header(s"small$i.txt", payload.length.toLong))
      os.write(payload)
      os.write(new Array[Byte](512 - payload.length))
    }
    os.write(new Array[Byte](1024))
    os.close()

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // (a) whole-member DSv2 read: the one content row
    timed(s"whole-member read (${memberMb} MiB, 1 task)") {
      spark.read.format("tar").load(tarPath.getPath)
        .select(sum(length(col("content")))).collect()
    }
    // (b) chunked: header-rate listing -> distributed preads
    val listing = spark.read.format("tar").load(tarPath.getPath)
      .select("archive", "member", "size", "offset")
    val chunks = TarChunks.chunkedContent(listing,
      chunkMb.toLong * 1024 * 1024)
    val stats = timed(s"chunked read ($chunkMb MiB chunks)") {
      chunks.select(col("member"), length(col("content")).as("len"),
          spark_partition_id().as("task"))
        .groupBy()
        .agg(sum(col("len")).as("bytes"),
          countDistinct(col("task")).as("tasks"),
          count(lit(1)).as("chunks"))
        .collect().head
    }
    println(s"bytes=${stats.getLong(0)} tasks=${stats.getLong(1)} " +
      s"chunks=${stats.getLong(2)}")
    // (c) inline hugeMemberMode=chunks: same scan, no manual branch —
    // rows still originate in the header-owning task but each is
    // ≤ chunkBytes (row-size safe); compare against (a) and (b)
    val inline = timed(s"hugeMemberMode=chunks inline read") {
      spark.read.format("tar")
        .option("hugeMemberMode", "chunks")
        .option("chunkBytes", (chunkMb.toLong * 1024 * 1024).toString)
        .load(tarPath.getPath)
        .select(sum(length(col("content"))).as("bytes"),
          count(lit(1)).as("rows"))
        .collect().head
    }
    println(s"inline bytes=${inline.getLong(0)} rows=${inline.getLong(1)}")
    require(inline.getLong(0) == stats.getLong(0),
      "inline chunk bytes must equal the TarChunks path")
    spark.stop()
  }
}
