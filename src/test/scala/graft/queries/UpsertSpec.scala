package graft.queries

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[RoundTrip.upsertPartitioned]]: the merge must rewrite ONLY the
  * touched partitions — untouched partition files come back
  * byte-identical (same paths, same bytes), which is the property
  * that makes partitioned MERGE affordable at 100 TB. Content
  * correctness is the oracle's job; this spec pins the IO shape. */
class UpsertSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def md5(p: Path): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    new java.math.BigInteger(1, d.digest(Files.readAllBytes(p))).toString(16)
  }

  private def parquetFiles(dir: String): Map[String, String] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => p.toString.stripPrefix(dir) -> md5(p))
      .toMap

  test("untouched partitions are byte-stable; touched ones are rewritten") {
    val d = Files.createTempDirectory("upsert-spec").toString
    val docs = (0L until 200L).map { i =>
      (i, s"doc $i body", "en", s"src${(i % 6) + 1}", 10L + i % 7)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")

    // drive the query's OWN two steps so the IO assertions hold for
    // the shipped code, not a replica
    val out = Files.createTempDirectory("upsert-io").toString
    RoundTrip.upsertWriteBase(spark, d, out)
    val before = parquetFiles(s"$out/base")
    RoundTrip.upsertMerge(spark, d, out)
    val after = parquetFiles(s"$out/base")
    val touched = RoundTrip.upsertTouched(spark, d)
    touched shouldBe Seq("src1", "src2", "src3") // 3 smallest of src1..src6
    import org.apache.spark.sql.functions._
    val untouchedBefore = before.filter(!_._1.contains("source=src1"))
      .filter(!_._1.contains("source=src2"))
      .filter(!_._1.contains("source=src3"))
    untouchedBefore.foreach { case (path, hash) =>
      withClue(s"untouched file $path: ") {
        after.get(path) shouldBe Some(hash)
      }
    }
    // touched partitions were rewritten (old files gone or changed)
    val touchedBefore = before.keySet.filter(p =>
      touched.exists(t => p.contains(s"source=$t")))
    touchedBefore.foreach { p =>
      assert(!after.get(p).contains(before(p)),
        s"touched file $p survived the rewrite byte-identically")
    }
    // merged content: updated rows carry the new text
    val back = spark.read.parquet(s"$out/base")
    back.filter(col("doc_id") % 7 === 0 && col("doc_id") < 1000000L &&
      col("source").isin(touched: _*))
      .collect().foreach(r => r.getAs[String]("text") should endWith("v2"))
    // 200 base rows + the inserts (doc_id ≡ 0 mod 6 ∧ ≡ 5 mod 11 in
    // src1 → 60, 126, 192)
    back.count() shouldBe 203L
    back.filter(col("doc_id") >= 1000000L).collect()
      .foreach(r => r.getAs[String]("text") should startWith("new "))
  }

  test("the catalog query runs end to end and returns one audit row") {
    val d = Files.createTempDirectory("upsert-q").toString
    (0L until 120L).map { i =>
      (i, s"t $i", "en", s"src${(i % 4) + 1}", 5L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val row = RoundTrip.upsertPartitioned(spark, d).collect()
    row.length shouldBe 1
    // inserts present: count exceeds the base corpus
    row.head.getLong(0) should be > 120L
  }
}
