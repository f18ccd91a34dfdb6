package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Pins the native [[graft.functions.expressions.MinhashSignature]]
  * expression to the composable formula it fuses
  * (shingleHashes + minhashFromHashes per seed): bit-equality on real
  * docs and agreement on the null/empty edge cases. If either side
  * changes, this must fail.
  */
class MinhashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  test("native minhash_sig is bit-identical to the composable formula") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m n o p",
      "short",
      "repeat repeat repeat repeat repeat",
      "Punctuation, and CASE; should not   matter here!").toDF("t")
    val both = docs
      .withColumn("sh", shingles(col("t"), 3))
      .withColumn("native", GraftFunctions.minhashSig(col("sh"), K))
      .withColumn("hs", shingleHashes(col("sh")))
      .withColumn("composed",
        array((0 until K).map(s => minhashFromHashes(col("hs"), s)): _*))
    val rows = both.select(col("native"), col("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null text and empty shingle set: all-null signature entries") {
    GraftFunctions.register(spark)
    val df = Seq(Some(""), None).toDF("t")
      .withColumn("sig",
        GraftFunctions.minhashSig(shingles(col("t"), 3), K))
    val rows = df.select(col("sig")).collect()
    // empty doc -> empty shingles -> array of K nulls
    assert(rows(0).getSeq[Any](0).length == K)
    assert(rows(0).getSeq[Any](0).forall(_ == null))
    // null text -> null shingles -> null signature
    assert(rows(1).isNullAt(0))
  }

  test("native word_shingles is bit-identical to the composable shingles") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "  Leading and   trailing whitespace\t mixed\nlines  ",
      "Русский Текст С Разными СЛОВАМИ здесь",
      "one two",
      "exactly three tokens",
      "a b c d e f g",
      "",
      "single").toDF("t")
    for (k <- Seq(1, 3, 8)) {
      val rows = docs
        .withColumn("native", GraftFunctions.wordShingles(col("t"), k))
        .withColumn("composed", shingles(col("t"), k))
        .select(col("native"), col("composed")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("native char_ngrams is bit-identical to the composable formula") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "The quick brown fox",
      "aaaa",          // heavy duplicate grams
      "abc",           // == n
      "ab",            // < n
      "",              // empty
      "Русский текст",
      "  spaces   collapse  ").toDF("t")
    for (n <- Seq(2, 4)) {
      val rows = docs
        .withColumn("native", GraftFunctions.charNgramsNative(col("t"), n))
        .withColumn("composed", charNgrams(col("t"), n))
        .select(col("native"), col("composed")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("ngram_hashes = shingleHashes∘charNgrams as a set; long jaccard agrees") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog",
      "aaaa bbbb aaaa", "ab", "", "Русский текст").toDF("t")
    val rows = docs
      .withColumn("native", GraftFunctions.ngramHashes(col("t"), 4))
      .withColumn("composed", shingleHashes(charNgrams(col("t"), 4)))
      .select(col("native"), col("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted)
    }
    // long-long jaccard path agrees with the composable set formula
    val pairs = docs.limit(2).crossJoin(docs.limit(2).select(col("t").as("u")))
      .withColumn("ga", GraftFunctions.ngramHashes(col("t"), 4))
      .withColumn("gb", GraftFunctions.ngramHashes(col("u"), 4))
      .withColumn("native", GraftFunctions.jaccardSim(col("ga"), col("gb")))
      .withColumn("composed", jaccard(col("ga"), col("gb")))
      .select(col("native"), col("composed")).collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native jaccard_sim is bit-identical to the composable formula") {
    GraftFunctions.register(spark)
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x", "x", "y"), Seq("y", "y", "x"))).toDF("a", "b")
    val rows = pairs
      .withColumn("native", GraftFunctions.jaccardSim(col("a"), col("b")))
      .withColumn("composed", jaccard(col("a"), col("b")))
      .select(col("native"), col("composed")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("SQL surface: minhash_sig callable after register") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 4) AS s")
      .selectExpr("size(s)").collect().head.getInt(0)
    assert(n == 4)
  }
}
