package graft.queries

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination (Curation.decontaminateBloom):
  * the sketch cascade must be EXACTLY equal to the exact broadcast
  * path (no false negatives + exact verify), and the registered
  * bloom_might_contain probe must never miss a true member. */
class BloomDecontamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom cascade equals the exact n-gram path on testdata") {
    val exact = Curation.decontaminateNgram(spark, sf)
      .orderBy("doc_id").collect().toSeq
    val bloom = Curation.decontaminateBloom(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture should contain at least one leak")
    assert(bloom == exact)
  }

  test("controlled corpus: verbatim 5-gram leak flagged, 4-gram near-miss not") {
    val dir = java.nio.file.Files.createTempDirectory("bloom-dec").toString
    import spark.implicits._
    // doc 0 and 20 are eval (doc_id % 20 == 0); 1 leaks a verbatim
    // 5-gram from doc 0, 2 shares only 4 consecutive words, 3 clean.
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (20L, "totally separate benchmark passage here now"),
      (1L, "prefix words alpha beta gamma delta epsilon suffix"),
      (2L, "alpha beta gamma delta UNRELATED tail words"),
      (3L, "nothing in common with the eval docs at all")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Curation.decontaminateBloom(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // doc 1 shares grams: "alpha beta gamma delta epsilon" and
    // (from doc 0's overlap window) "beta gamma delta epsilon" is
    // only 4 words — so exactly the 1 five-gram leaks.
    assert(out.head.getLong(1) == 1L)
  }

  test("bloom_might_contain has zero false negatives on its member set") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val members = (0L until 5000L).map(i => i * 2654435761L)
    val df = members.toDF("v")
    val bloom = df.stat.bloomFilter("v", members.size.toLong, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val hits = df.filter(GraftFunctions.bloomMightContain(bytes, col("v")))
      .count()
    assert(hits == members.size.toLong)
  }
}
