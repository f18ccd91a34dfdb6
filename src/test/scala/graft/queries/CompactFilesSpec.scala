package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Layout.compactFiles]]: executed OPTIMIZE — a many-small-files
  * table rewrites into few target-sized bins with byte-level content
  * parity (every row survives exactly once) and a real file-count
  * reduction. */
class CompactFilesSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("compaction reduces file count and preserves every row exactly once") {
    val d = java.nio.file.Files.createTempDirectory("compact-in").toString
    val rows = (0L until 20000L).map(i => (i, s"payload $i", i % 17))
    // deliberately fragmented: 40 small files
    rows.toDF("id", "body", "grp").repartition(40)
      .write.mode("overwrite").parquet(d)
    val before = new java.io.File(d).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    before shouldBe 40

    val out = java.nio.file.Files.createTempDirectory("compact-out").toString
    // target ≈ total/5 → ~5 bins
    val total = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (nBefore, nAfter, nBins) =
      Layout.compactFiles(spark, d, out, total / 5)

    nBefore shouldBe 40
    nBins should be <= 8
    nAfter shouldBe nBins // every multi-file bin became ONE file
    nAfter should be < nBefore

    // content parity: every row exactly once, values intact
    val back = spark.read.parquet(s"$out/bin_*")
    back.count() shouldBe 20000L
    val got = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    got shouldBe rows.toArray
  }

  test("URL-encodable characters in source file names lose no rows") {
    // input_file_name() returns the URI-ENCODED path; the bin-map key
    // must use the same rendering or the inner join silently drops
    // every row of such files (review-caught regression)
    val d = java.nio.file.Files.createTempDirectory("compact-enc").toString
    (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(d)
    val dir = new java.io.File(d)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        // spaces and '#' both URL-encode; '#' additionally breaks a
        // naive URI round trip
        assert(f.renameTo(new java.io.File(dir, s"part $i odd#.parquet")))
      }
    val out = java.nio.file.Files.createTempDirectory("compact-enco").toString
    val total = dir.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (nb, _, _) = Layout.compactFiles(spark, d, out, total / 2)
    nb shouldBe 4
    val back = spark.read.parquet(s"$out/bin_*")
    back.count() shouldBe 500L
    back.agg(sum(col("id"))).head.getLong(0) shouldBe (0L until 500L).sum
  }

  test("a single oversized file passes through without a rewrite job merge") {
    val d = java.nio.file.Files.createTempDirectory("compact-one").toString
    (0L until 100L).map(i => (i, "x")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(d)
    val out = java.nio.file.Files.createTempDirectory("compact-oneo").toString
    val (nb, na, bins) = Layout.compactFiles(spark, d, out, 10L)
    nb shouldBe 1
    bins shouldBe 1
    na shouldBe 1
    spark.read.parquet(s"$out/bin_*").count() shouldBe 100L
  }
}
